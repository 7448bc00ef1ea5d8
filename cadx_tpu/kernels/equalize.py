"""Pallas TPU kernel: histogram equalization, whole image in VMEM.

Bit-identical to cv2.equalizeHist (same rounding rules): per-bin
fori_loops over the VMEM-resident plane for the histogram and LUT
application, doubling prefix-sum for the CDF.

Perf gate result (SURVEY section 7 policy): the batched XLA path in
ops.histogram wins on this chip (8.5 vs 14.3 ms per 128-batch — the 512
sequential per-bin passes serialize on the VPU while the XLA
compare-reduce parallelizes across the whole batch), so ops.histogram
stays in the hot path and this kernel is an available, parity-tested
alternative.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _equalize_kernel(img_ref, out_ref, hist_scratch):
    _, h, w = img_ref.shape
    img = img_ref[0].astype(jnp.int32)

    # 256-bin histogram: per-bin compare+sum on the VMEM-resident plane
    def hist_body(bval, _):
        count = jnp.sum((img == bval).astype(jnp.int32))
        hist_scratch[pl.ds(bval, 1), :] = count.reshape(1, 1)
        return 0

    lax.fori_loop(0, 256, hist_body, 0)
    hist2 = hist_scratch[:, 0].reshape(1, 256)             # (1, 256)
    # doubling prefix sum (no Mosaic cumsum lowering)
    cdf2 = hist2
    col = lax.broadcasted_iota(jnp.int32, (1, 256), 1)
    shift = 1
    while shift < 256:
        rolled = pltpu.roll(cdf2, shift, 1)
        cdf2 = cdf2 + jnp.where(col < shift, 0, rolled)
        shift *= 2
    hist = hist2[0]
    cdf = cdf2[0]                                          # (256,)
    total = jnp.sum(jnp.where(col[0] == 255, cdf, 0))
    bins = col[0]
    # first occupied bin (int argmax has no Mosaic lowering -> masked min)
    first_idx = jnp.min(jnp.where(hist > 0, bins, 256))
    # cdf[first_idx] == hist[first_idx] (first occupied bin)
    cdf_min = jnp.sum(jnp.where(bins == first_idx, hist, 0))
    denom = jnp.maximum(total - cdf_min, 1).astype(jnp.float32)
    lut = jnp.clip(
        jnp.round((cdf - cdf_min).astype(jnp.float32) * 255.0 / denom),
        0, 255).astype(jnp.int32)                          # (256,)
    # stash the LUT so the apply loop reads scalars via dynamic ref slices
    hist_scratch[:, :] = lut.reshape(256, 1)

    # LUT application: accumulate lut[b] over the matching pixels per bin
    def apply_body(bval, acc):
        lut_b = hist_scratch[pl.ds(bval, 1), :][0, 0]
        return acc + jnp.where(img == bval, lut_b, 0)

    out = lax.fori_loop(0, 256, apply_body, jnp.zeros((h, w), jnp.int32))
    single_level = jnp.sum((hist > 0).astype(jnp.int32)) <= 1
    out_ref[0] = jnp.where(single_level, img, out)


@functools.partial(jax.jit, static_argnames=("interpret",))
def equalize_hist_pallas(imgs_u8: jax.Array, interpret: bool = False) -> jax.Array:
    """Batched cv2.equalizeHist: (B, H, W) uint8 -> (B, H, W) uint8."""
    b, h, w = imgs_u8.shape
    spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _equalize_kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        grid=(b,),
        in_specs=[spec],
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((256, 1), jnp.int32)],
        interpret=interpret,
    )(imgs_u8.astype(jnp.int32))
    return out.astype(jnp.uint8)
