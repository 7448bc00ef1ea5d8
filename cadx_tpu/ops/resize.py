"""On-device image resize matching the cv2 modes the reference uses.

The pipeline resizes with INTER_AREA for downscale (app.py:136, :170) and
INTER_LINEAR for feature maps (app.py:487) / heatmaps
(explainability.py:76). INTER_LINEAR == jax.image 'linear' (both use
half-pixel centers). INTER_AREA with integer scale factors is an exact
box mean (implemented directly); non-integer factors fall back to
antialiased linear, which tracks cv2 area closely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def resize_linear(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """cv2.INTER_LINEAR equivalent. img: (H, W) or (H, W, C), float."""
    shape = (out_hw[0], out_hw[1]) + img.shape[2:]
    # cv2 INTER_LINEAR never antialiases, even when downscaling
    return jax.image.resize(img.astype(jnp.float32), shape, method="linear",
                            antialias=False)


def resize_area(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """cv2.INTER_AREA equivalent for downscale.

    Integer factors: exact box average. Otherwise antialiased linear.
    """
    h, w = img.shape[:2]
    oh, ow = out_hw
    if oh > 0 and ow > 0 and h % oh == 0 and w % ow == 0:
        fh, fw = h // oh, w // ow
        x = img.astype(jnp.float32).reshape((oh, fh, ow, fw) + img.shape[2:])
        return x.mean(axis=(1, 3))
    shape = (oh, ow) + img.shape[2:]
    return jax.image.resize(img.astype(jnp.float32), shape, method="linear",
                            antialias=True)


def resize_nearest(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    shape = (out_hw[0], out_hw[1]) + img.shape[2:]
    return jax.image.resize(img, shape, method="nearest")


@functools.cache
def _interp_matrix(n_out: int, n_in: int):
    """(n_out, n_in) bilinear sampling matrix, half-pixel centers — the
    same sample points as cv2.INTER_LINEAR / jax.image 'linear'."""
    import numpy as np

    r = np.clip((np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5, 0.0,
                n_in - 1.0)
    lo = np.floor(r).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = (r - lo).astype(np.float32)
    m = np.zeros((n_out, n_in), np.float32)
    m[np.arange(n_out), lo] += 1.0 - frac
    m[np.arange(n_out), hi] += frac
    return m


def resize_linear_mxu(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize as two small matmuls (R @ img @ C^T) — the MXU
    form. Samples the identical points as resize_linear; float summation
    order differs from jax.image.resize's gather form by ~1 ulp, so use
    on tolerance-contracted paths (CAM upsampling), not bit-parity ones.
    img: (H, W) or (B, H, W) float."""
    oh, ow = out_hw
    h, w = img.shape[-2], img.shape[-1]
    r = jnp.asarray(_interp_matrix(oh, h))
    ct = jnp.asarray(_interp_matrix(ow, w).T)
    x = img.astype(jnp.float32)
    return jnp.einsum("oh,...hw,wk->...ok", r, x, ct,
                      precision=jax.lax.Precision.HIGHEST)
