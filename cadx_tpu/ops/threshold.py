"""On-device thresholding (cv2.threshold THRESH_BINARY semantics).

Used by the artifact-suppression and breast-segmentation stages
(reference customImageCleaner.py:101, :111, :130): dst = maxval where
src > thresh else 0.
"""

from __future__ import annotations

import functools as _functools

import jax
import jax.numpy as jnp


def binary_threshold(img: jax.Array, thresh, maxval=255) -> jax.Array:
    """cv2.THRESH_BINARY: strictly-greater comparison, like OpenCV."""
    return jnp.where(img > thresh, jnp.asarray(maxval, img.dtype), jnp.asarray(0, img.dtype))


def relative_threshold_value(img: jax.Array, frac) -> jax.Array:
    """The reference's threshold rule (customImageCleaner.py:96-99):
    values < 1.0 scale by the image max (int-truncated); values >= 1.0
    are ABSOLUTE pixel thresholds used as-is.

    For integer images with a static frac the reference's FLOAT64
    int(max * frac) is reproduced exactly via a host-precomputed table
    over all possible maxima — an on-device f32 product differs by one
    at some (max, frac) pairs (e.g. f32: floor(230 * 0.1) = 23, f64:
    int(22.999...) = 22), flipping every pixel at that threshold."""
    if isinstance(frac, (int, float)) and frac >= 1.0:
        return jnp.int32(int(frac))
    if (isinstance(frac, float)
            and jnp.issubdtype(img.dtype, jnp.integer)
            and jnp.dtype(img.dtype).itemsize <= 2):
        n = 1 << (8 * jnp.dtype(img.dtype).itemsize)
        return jnp.asarray(_trunc_table(frac, n))[img.max().astype(jnp.int32)]
    return jnp.floor(img.max().astype(jnp.float32) * frac).astype(jnp.int32)


@_functools.lru_cache(maxsize=64)
def _trunc_table(frac: float, n: int):
    import numpy as _np

    return _np.asarray([int(m * frac) for m in range(n)], dtype=_np.int32)


def max_pix_val(dtype) -> int:
    """Reference max_pix_val (customImageCleaner.py:84-91)."""
    dtype = jnp.dtype(dtype)
    if dtype == jnp.uint8:
        return 255
    if dtype == jnp.uint16:
        return 65535
    raise ValueError(f"Unknown dtype found in input image array: {dtype}")


def to_uint8(img: jax.Array) -> jax.Array:
    """(img / img.max() * 255) as uint8 — reference 8-bit rescale
    (customImageCleaner.py:109, app.py:101)."""
    maxv = jnp.maximum(img.max().astype(jnp.float32), 1e-12)
    return (img.astype(jnp.float32) / maxv * 255.0).astype(jnp.uint8)
