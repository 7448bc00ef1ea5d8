"""On-device histogram equalization (cv2.equalizeHist semantics).

Used by pectoral-muscle removal (customImageCleaner.py:127). OpenCV's
algorithm: 256-bin histogram, cumulative distribution excluding the
first nonzero bin's mass, LUT = round(cdf * 255 / (N - cdf_min)), where
cdf_min is the count at the lowest occupied intensity. Histogram via
scatter-add, LUT application via gather — both lower cleanly to TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def histogram256(img_u8: jax.Array) -> jax.Array:
    # comparison-reduce instead of scatter-add: 256 vectorized equality
    # reductions lower to pure VPU work (~40% faster than TPU scatters)
    flat = img_u8.astype(jnp.int32).reshape(-1)
    bins = jnp.arange(256, dtype=jnp.int32)
    return (flat[None, :] == bins[:, None]).sum(axis=1).astype(jnp.int32)


def equalize_hist(img_u8: jax.Array) -> jax.Array:
    """Equalize a (H, W) uint8 image exactly like cv2.equalizeHist.

    On TPU at real image sizes, dispatches to the VMEM-resident Pallas
    kernel (kernels/equalize.py) — bit-identical, ~1.6x faster than the
    XLA compare-reduce (5.45 vs 8.71 ms/128-batch at 256x256)."""
    from cadx_tpu.ops.components import _use_pallas

    if img_u8.dtype != jnp.uint8:
        # cv2.equalizeHist only accepts 8-bit input (the reference would
        # raise here too); a 16-bit image fed through the 256-bin LUT
        # would be silently zeroed, which is far worse than an error
        raise ValueError(
            f"equalize_hist needs uint8 input, got {img_u8.dtype} "
            "(rescale with ops.threshold.to_uint8 first)")
    h, w = img_u8.shape
    # _use_pallas is deliberately reused as a conservative TPU/size/
    # escape-hatch gate (its CCL label-bit check is irrelevant here but
    # only rejects sizes far beyond any serving image); the kernel chunks
    # the flattened image by the largest power of two dividing H*W — odd
    # sizes would degrade to tiny serial chunks, so only dispatch when a
    # wide chunk (>=2048 lanes) exists
    if _use_pallas(h, w, planes=8) and (h * w) % 2048 == 0:
        from cadx_tpu.kernels.equalize import equalize_hist_pallas

        return equalize_hist_pallas(img_u8[None])[0]
    hist = histogram256(img_u8)
    cdf = jnp.cumsum(hist)
    total = cdf[-1]
    # lowest occupied intensity's cumulative count
    nz = hist > 0
    first_idx = jnp.argmax(nz)  # first True
    cdf_min = cdf[first_idx]
    denom = jnp.maximum(total - cdf_min, 1)
    # OpenCV: lut[i] = saturate(round((cdf[i] - cdf_min) * 255 / denom))
    lut = jnp.clip(
        jnp.round((cdf - cdf_min).astype(jnp.float32) * 255.0 / denom.astype(jnp.float32)),
        0,
        255,
    ).astype(jnp.uint8)
    out = apply_lut256(img_u8, lut)
    # degenerate single-intensity image: OpenCV returns it unchanged
    single_level = (hist > 0).sum() <= 1
    return jnp.where(single_level, img_u8, out)


def apply_lut256(img_u8: jax.Array, lut: jax.Array) -> jax.Array:
    """LUT application as a one-hot matmul (MXU) — TPU gathers from small
    tables are ~10x slower than the equivalent one-hot dot."""
    oh = jax.nn.one_hot(img_u8.astype(jnp.int32), 256, dtype=jnp.float32)
    vals = oh @ lut.astype(jnp.float32)
    return jnp.round(vals).astype(lut.dtype)
