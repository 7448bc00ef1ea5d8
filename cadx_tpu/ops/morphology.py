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


def _window_reduce(img: jax.Array, ksize: int, init, op) -> jax.Array:
    # rectangular min/max filters are separable: k x 1 then 1 x k costs
    # 2k taps instead of k^2
    pad = ksize // 2
    lo, hi = pad, ksize - 1 - pad  # cv2 anchors odd kernels at center
    out = lax.reduce_window(
        img, init, op, (ksize, 1), (1, 1), ((lo, hi), (0, 0))
    )
    return lax.reduce_window(
        out, init, op, (1, ksize), (1, 1), ((0, 0), (lo, hi))
    )


def erode(img: jax.Array, ksize: int = 3, iterations: int = 1) -> jax.Array:
    """Min filter; border treated as +max (cv2 default)."""
    dtype = img.dtype
    x = img.astype(jnp.float32)
    for _ in range(iterations):
        x = _window_reduce(x, ksize, jnp.inf, lax.min)
    return x.astype(dtype)


def dilate(img: jax.Array, ksize: int = 3, iterations: int = 1) -> jax.Array:
    """Max filter; border treated as -max (cv2 default)."""
    dtype = img.dtype
    x = img.astype(jnp.float32)
    for _ in range(iterations):
        x = _window_reduce(x, ksize, -jnp.inf, lax.max)
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
