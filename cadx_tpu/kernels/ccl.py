"""Pallas TPU kernel: connected-component labeling, whole image in VMEM.

The XLA path (cadx_tpu.ops.components) runs each propagation sweep as
~30 HBM-materialized passes (packed scans via cummin + window min); for
maze-like masks needing 10+ sweeps that's hundreds of HBM round trips.
This kernel keeps the labels, mask, and segment ids resident in VMEM for
the WHOLE relaxation: one program per image, a lax.while_loop of sweeps,
with the segmented min-scans implemented as log2(N) shifted-min steps
(Hillis-Steele doubling) on VMEM vectors via pltpu.roll.

Same packed-int32 encoding as the XLA path: (segment_id << label_bits) |
label, segment order inverted per scan direction so foreign segments
never win the min. Results are bit-identical to ops.components.

VMEM budget per 256x256 image: ~6 int32 planes = 1.5MB (fits easily).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shifted_min(p, shift: int, axis: int, fill):
    """min(p, p shifted forward by `shift` along axis), vacated cells=fill."""
    rolled = pltpu.roll(p, shift, axis)
    idx = lax.broadcasted_iota(jnp.int32, p.shape, axis)
    return jnp.minimum(p, jnp.where(idx < shift, fill, rolled))


def _shifted_min_rev(p, shift: int, axis: int, fill):
    n = p.shape[axis]
    rolled = pltpu.roll(p, n - shift, axis)  # pltpu.roll needs shift >= 0
    idx = lax.broadcasted_iota(jnp.int32, p.shape, axis)
    return jnp.minimum(p, jnp.where(idx >= n - shift, fill, rolled))


def cumsum_i32(x, axis: int):
    """Inclusive doubling prefix sum along `axis` (no Mosaic cumsum
    lowering; exact for int32). Shared by the CCL/largest-obj segment
    ids, the mode kernel's run barriers, and the equalize CDF."""
    n = x.shape[axis]
    idx = lax.broadcasted_iota(jnp.int32, x.shape, axis)
    shift = 1
    while shift < n:
        rolled = pltpu.roll(x, shift, axis)
        x = x + jnp.where(idx < shift, 0, rolled)
        shift *= 2
    return x


def _doubling_cummin(p, axis: int, reverse: bool, fill, cap: int = 0):
    """Doubling cummin; `cap` bounds the window (0 = full axis). A cap
    only bounds how far a label travels per scan — the relaxation
    fixpoint is unchanged (same argument as the watershed's max_scan)."""
    n = min(p.shape[axis], cap) if cap else p.shape[axis]
    shift = 1
    while shift < n:
        p = (_shifted_min_rev if reverse else _shifted_min)(p, shift, axis, fill)
        shift *= 2
    return p


def ccl_relax(mask, row_seg, col_seg, *, lbl_bits: int,
              connectivity: int, max_iters: int, nb_rounds: int = 1,
              scan_cap: int = 0):
    """In-kernel CCL to the fixpoint: (h, w) bool mask + barrier segment
    ids -> int32 labels (component-min linear index; background holds
    the (1<<lbl_bits)-1 sentinel). Shared by the standalone CCL kernel
    and the fused largest-object kernel (kernels/largest_obj.py).

    nb_rounds repeats the cheap 1-hop neighbour-min step that many
    times per sweep. Diagonal speckle chains (8-connectivity) propagate
    only one hop per round while the row/col line scans fly past them,
    so speckle-heavy masks are round-bound: at the pectoral call site
    (median 13 sweeps at nb_rounds=1) nb_rounds=8 cuts sweeps to 3-5
    and measured 8.8 -> 5.0 ms/96-batch. Blob-dominated masks
    (suppress/segment, 3 sweeps either way) keep the default 1 — extra
    rounds there are pure cost. The fixpoint (and thus the labels) is
    identical for any nb_rounds: rounds are idempotent relaxations
    (verified bit-exact on-chip across k=1,2,4,6,8,12,16)."""
    h, w = mask.shape
    lbl_mask = np.int32((1 << lbl_bits) - 1)
    big = np.int32(2**30)
    max_row_seg = np.int32(w + 1)
    max_col_seg = np.int32(h + 1)

    iota = (lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
            + lax.broadcasted_iota(jnp.int32, (h, w), 1))
    init = jnp.where(mask, iota, lbl_mask)

    def sweep(vals):
        p = ((max_row_seg - row_seg) << lbl_bits) | vals
        f = _doubling_cummin(p, 1, False, big, scan_cap) & lbl_mask
        p = (row_seg << lbl_bits) | vals
        b = _doubling_cummin(p, 1, True, big, scan_cap) & lbl_mask
        vals = jnp.where(mask, jnp.minimum(f, b), lbl_mask)
        p = ((max_col_seg - col_seg) << lbl_bits) | vals
        f = _doubling_cummin(p, 0, False, big, scan_cap) & lbl_mask
        p = (col_seg << lbl_bits) | vals
        b = _doubling_cummin(p, 0, True, big, scan_cap) & lbl_mask
        vals = jnp.where(mask, jnp.minimum(f, b), lbl_mask)
        if connectivity == 8:
            def nb_round(_, v):
                nb = _shifted_min(v, 1, 0, lbl_mask)
                nb = _shifted_min_rev(nb, 1, 0, lbl_mask)
                nb = _shifted_min(nb, 1, 1, lbl_mask)
                nb = _shifted_min_rev(nb, 1, 1, lbl_mask)
                return jnp.where(mask, nb, lbl_mask)

            vals = lax.fori_loop(0, nb_rounds, nb_round, vals)
        return vals

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        vals, _, it = state
        new = sweep(vals)
        return new, jnp.any(new != vals), it + 1

    final, _, _ = lax.while_loop(cond, body, (init, jnp.bool_(True), 0))
    return final


def _ccl_kernel(mask_ref, rowseg_ref, colseg_ref, out_ref, *, lbl_bits: int,
                connectivity: int, max_iters: int):
    out_ref[0] = ccl_relax(mask_ref[0] != 0, rowseg_ref[0], colseg_ref[0],
                           lbl_bits=lbl_bits, connectivity=connectivity,
                           max_iters=max_iters)


@functools.partial(jax.jit, static_argnames=("connectivity", "max_iters", "interpret"))
def label_components_pallas(masks: jax.Array, connectivity: int = 8,
                            max_iters: int = 128,
                            interpret: bool = False) -> jax.Array:
    """Batched CCL: (B, H, W) bool -> (B, H, W) int32 labels.

    Bit-identical to vmap(ops.components.label_components) for images
    whose (H*W+1) fits the packed encoding. One grid program per image;
    the full relaxation runs in VMEM.
    """
    b, h, w = masks.shape
    lbl_bits = int(np.ceil(np.log2(h * w + 1)))
    seg_bits = int(np.ceil(np.log2(max(h, w) + 2)))
    if lbl_bits + seg_bits > 30:  # +1 headroom under the packed big fill
        raise ValueError(f"image too large for packed CCL kernel: {h}x{w}")

    mask_i32 = masks.astype(jnp.int32)
    barriers = 1 - mask_i32
    row_seg = jnp.cumsum(barriers, axis=2, dtype=jnp.int32)
    col_seg = jnp.cumsum(barriers, axis=1, dtype=jnp.int32)

    kernel = functools.partial(_ccl_kernel, lbl_bits=lbl_bits,
                               connectivity=connectivity, max_iters=max_iters)
    spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        grid=(b,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(mask_i32, row_seg, col_seg)
