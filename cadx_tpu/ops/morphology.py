"""Binary/grayscale morphology as XLA reduce_window ops.

cv2 erode/dilate with an all-ones rectangular kernel are min/max filters;
OpenCV's default border value is +inf for erode and -inf for dilate so
out-of-image pixels never win — reproduced here via pad values. Used by
artifact suppression (MORPH_OPEN smoothing, customImageCleaner.py:78-80)
and pectoral removal (erode/dilate marker prep, :135-139).

All ops take 2D (H, W) arrays; vmap for batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _axis_window_reduce(x: jax.Array, k: int, init, op, axis: int) -> jax.Array:
    """Sliding min/max of centered odd window k along one axis in O(1)
    taps per pixel (van Herk / Gil-Werman): block prefix+suffix scans of
    length k, then out[i] = op(suffix[i-r], prefix[i+r]). Identical to a
    k-tap reduce_window; ~k/3 times fewer ops for the cleaner's big
    kernels (15/25-wide after iteration composition)."""
    n = x.shape[axis]
    r = k // 2
    m = -(-(n + 2 * r) // k) * k                 # padded length, multiple of k
    lo_pad = r
    hi_pad = m - n - r
    pad_cfg = [(0, 0)] * x.ndim
    pad_cfg[axis] = (lo_pad, hi_pad)
    xp = jnp.pad(x, pad_cfg, constant_values=init)
    block_shape = list(xp.shape)
    block_shape[axis : axis + 1] = [m // k, k]
    xb = xp.reshape(block_shape)
    ax = axis + 1
    prefix = lax.associative_scan(op, xb, axis=ax)
    suffix = lax.associative_scan(op, xb, axis=ax, reverse=True)
    prefix = prefix.reshape(xp.shape)
    suffix = suffix.reshape(xp.shape)
    # out[i] (0-based in x) = op(suffix[i], prefix[i + 2r]) over padded coords
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(0, n)
    s = suffix[tuple(idx)]
    idx[axis] = slice(2 * r, 2 * r + n)
    p = prefix[tuple(idx)]
    return op(s, p)


def _window_reduce(img: jax.Array, ksize: int, init, op) -> jax.Array:
    # rectangular min/max filters are separable; each axis in O(1)/px
    if ksize == 1:
        return img
    out = _axis_window_reduce(img, ksize, init, op, 0)
    return _axis_window_reduce(out, ksize, init, op, 1)


def _effective_k(ksize: int, iterations: int) -> int:
    # iterating a centered (2r+1) rect structuring element n times equals
    # one pass with radius n*r (Minkowski composition of rectangles)
    return (ksize - 1) * iterations + 1


def erode(img: jax.Array, ksize: int = 3, iterations: int = 1) -> jax.Array:
    """Min filter; border treated as +max (cv2 default). `iterations`
    composes exactly into one wider pass."""
    dtype = img.dtype
    x = img.astype(jnp.float32)
    x = _window_reduce(x, _effective_k(ksize, iterations), jnp.inf, lax.min)
    return x.astype(dtype)


def dilate(img: jax.Array, ksize: int = 3, iterations: int = 1) -> jax.Array:
    """Max filter; border treated as -max (cv2 default)."""
    dtype = img.dtype
    x = img.astype(jnp.float32)
    x = _window_reduce(x, _effective_k(ksize, iterations), -jnp.inf, lax.max)
    return x.astype(dtype)


def opening(img: jax.Array, ksize: int, iterations: int = 1) -> jax.Array:
    """MORPH_OPEN = erode then dilate (boundary smoothing in the cleaner)."""
    return dilate(erode(img, ksize, iterations), ksize, iterations)


def closing(img: jax.Array, ksize: int, iterations: int = 1) -> jax.Array:
    return erode(dilate(img, ksize, iterations), ksize, iterations)


def median_blur(img: jax.Array, ksize: int = 3) -> jax.Array:
    """k x k median filter with replicated borders (cv2.medianBlur).

    Gathers the k^2 shifted views and sorts along a new axis — a
    fixed-size vectorized sort the VPU handles well; no data-dependent
    control flow. Intended for the small odd kernels the reference uses
    (blur_kn_size 3 or 5).
    """
    if ksize % 2 != 1 or ksize < 1:
        raise ValueError("median_blur requires an odd ksize >= 1")
    dtype = img.dtype
    pad = ksize // 2
    x = jnp.pad(img.astype(jnp.float32), pad, mode="edge")
    h, w = img.shape
    views = [x[i : i + h, j : j + w]
             for i in range(ksize) for j in range(ksize)]
    stack = jnp.stack(views, axis=-1)
    return jnp.sort(stack, axis=-1)[..., (ksize * ksize) // 2].astype(dtype)


def median_blur3(img: jax.Array) -> jax.Array:
    """cv2.medianBlur(img, 3) (kept for callers of the original name)."""
    return median_blur(img, 3)
