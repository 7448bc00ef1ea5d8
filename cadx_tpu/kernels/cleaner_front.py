"""Pallas TPU kernel: the cleaner's FRONT half (artifact suppression +
breast segmentation) in ONE VMEM-resident program per image.

`clean_boundary_gray` (preprocess/cleaner.py, mirroring the reference
chain at WebApplicationPrototype/app.py:96-135 /
customImageCleaner.py:93-123) runs suppress_artifacts then
segment_breast — as separate dispatches that is two largest-object
Pallas launches plus XLA threshold/rescale/mask glue per image, and the
per-program launch overhead dominates the actual VPU work (CLAUDE.md,
round-2 lesson). This kernel chains both stages on the raw uint8 image
with every intermediate staying in VMEM:

  stage 1 (suppress_artifacts, customImageCleaner.py:93-105):
    threshold at floor(0.05*max) -> CCL -> argmax-area component ->
    hole fill -> opening(15) -> mask AND
  stage 2 (segment_breast crop=False, customImageCleaner.py:107-123):
    8-bit rescale of the suppressed image -> threshold at
    floor(0.05*max) -> hole fill -> CCL -> argmax-area -> breast mask

using the SAME phase implementations as the standalone kernels
(kernels/ccl.py::ccl_relax, kernels/mode.py::largest_mask_from_labels,
kernels/largest_obj.py fill/opening) — results are bit-identical to
composing suppress_artifacts + segment_breast_mask.

Outputs: img_breast_only (stage-2-masked suppressed image),
breast_mask (stage-1 mask), contour_fill (stage-2 mask, for the
bounding rect computed by the caller).

Only the uint8 path is fused (clean_boundary_gray always rescales to
uint8 first); uint16 inputs take the composed kernels.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cadx_tpu.kernels.ccl import ccl_relax
from cadx_tpu.kernels.largest_obj import _fill_holes, _opening, _segs
from cadx_tpu.kernels.mode import largest_mask_from_labels


def _table_at_max(table_row, img_i32):
    """table[max(img)] via a masked reduce (value-space dynamic indexing
    has no Mosaic lowering). table_row: (1, 256) int32 — the host-exact
    int(max * frac) truncation table (ops/threshold._trunc_table), so
    the kernel's thresholds are bit-identical to the ops path's FLOAT64
    reference semantics, not an f32 approximation."""
    mx = jnp.max(img_i32)
    idx = jax.lax.broadcasted_iota(jnp.int32, table_row.shape, 1)
    return jnp.sum(jnp.where(idx == mx, table_row, 0))


def _front_kernel(raw_ref, thr_ref, breast_only_ref, mask1_ref,
                  contour_ref, *, lbl_bits: int, smooth_k: int,
                  max_iters: int):
    raw = raw_ref[0]                                    # int32, uint8 range

    # ---- stage 1: suppress_artifacts ----
    low1 = _table_at_max(thr_ref[0], raw)
    m1 = raw > low1
    rs, cs = _segs(m1)
    labels1 = ccl_relax(m1, rs, cs, lbl_bits=lbl_bits, connectivity=8,
                        max_iters=max_iters)
    big1 = largest_mask_from_labels(labels1, m1)
    big1 = _fill_holes(big1, max_iters)
    mask1 = _opening(big1, smooth_k)
    img_suppr = jnp.where(mask1, raw, 0)                # uint8-range AND

    # ---- stage 2: segment_breast (crop=False) ----
    # to_uint8: (img / max * 255) truncated — identical f32 ops to
    # ops/threshold.to_uint8, so the rescale is bit-identical
    maxv = jnp.maximum(jnp.max(img_suppr).astype(jnp.float32), 1e-12)
    img8 = (img_suppr.astype(jnp.float32) / maxv * 255.0).astype(jnp.int32)
    low2 = _table_at_max(thr_ref[0], img8)
    m2 = img8 > low2
    filled2 = _fill_holes(m2, max_iters)
    rs2, cs2 = _segs(filled2)
    labels2 = ccl_relax(filled2, rs2, cs2, lbl_bits=lbl_bits,
                        connectivity=8, max_iters=max_iters)
    contour = largest_mask_from_labels(labels2, filled2)

    breast_only_ref[0] = jnp.where(contour, img_suppr, 0)
    mask1_ref[0] = mask1.astype(jnp.int32)
    contour_ref[0] = contour.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=(
    "smooth_k", "low_frac", "max_iters", "interpret"))
def cleaner_front_pallas(raw_u8: jax.Array, smooth_k: int = 15,
                         low_frac: float = 0.05, max_iters: int = 128,
                         interpret: bool = False):
    """Batched fused suppress+segment front: (B,H,W) uint8-range ->
    (img_breast_only i32, breast_mask bool, contour_fill bool).
    H, W must be powers of two (the bitonic mode phase)."""
    b, h, w = raw_u8.shape
    if (h & (h - 1)) or (w & (w - 1)):
        raise ValueError(f"fused kernel needs power-of-two dims, got {h}x{w}")
    lbl_bits = int(np.ceil(np.log2(h * w + 1)))
    seg_bits = int(np.ceil(np.log2(max(h, w) + 2)))
    if lbl_bits + seg_bits > 30:
        raise ValueError(f"image too large for packed CCL: {h}x{w}")
    spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    # exact reference truncation table (float64 int(max*frac)) shared
    # with ops/threshold.relative_threshold_value; frac >= 1.0 is the
    # absolute-threshold branch (constant table)
    from cadx_tpu.ops.threshold import _trunc_table

    if low_frac >= 1.0:
        thr_np = np.full((256,), int(low_frac), np.int32)
    else:
        thr_np = _trunc_table(float(low_frac), 256)
    thr = jnp.broadcast_to(jnp.asarray(thr_np)[None, None, :], (b, 1, 256))
    thr_spec = pl.BlockSpec((1, 1, 256), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    breast_only, mask1, contour = pl.pallas_call(
        functools.partial(_front_kernel, lbl_bits=lbl_bits,
                          smooth_k=smooth_k, max_iters=max_iters),
        out_shape=(jax.ShapeDtypeStruct((b, h, w), jnp.int32),
                   jax.ShapeDtypeStruct((b, h, w), jnp.int32),
                   jax.ShapeDtypeStruct((b, h, w), jnp.int32)),
        grid=(b,),
        in_specs=[spec, thr_spec],
        out_specs=(spec, spec, spec),
        interpret=interpret,
    )(raw_u8.astype(jnp.int32), thr)
    return breast_only, mask1 == 1, contour == 1
