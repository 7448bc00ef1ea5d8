"""Pallas TPU kernel: binary flood fill (border reachability) in VMEM.

Boolean analogue of the CCL kernel: one bit of payload packed under the
row/column segment ids, propagated with doubling cummax scans, whole
relaxation VMEM-resident. Backs ops.components.flood_from / fill_holes
on TPU.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shifted_max(p, shift: int, axis: int, fill):
    rolled = pltpu.roll(p, shift, axis)
    idx = lax.broadcasted_iota(jnp.int32, p.shape, axis)
    return jnp.maximum(p, jnp.where(idx < shift, fill, rolled))


def _shifted_max_rev(p, shift: int, axis: int, fill):
    n = p.shape[axis]
    rolled = pltpu.roll(p, n - shift, axis)
    idx = lax.broadcasted_iota(jnp.int32, p.shape, axis)
    return jnp.maximum(p, jnp.where(idx >= n - shift, fill, rolled))


def _doubling_cummax(p, axis: int, reverse: bool):
    n = p.shape[axis]
    neg = np.int32(-(2**30))
    shift = 1
    while shift < n:
        p = (_shifted_max_rev if reverse else _shifted_max)(p, shift, axis, neg)
        shift *= 2
    return p


def flood_relax(mask, seed, row_seg, col_seg, *, max_iters: int,
                connectivity: int = 4, enabled=None):
    """In-kernel flood to the fixpoint: i32 (h, w) mask/seed (0/1) +
    barrier segment ids -> i32 reach. 4-connected by default (cv2
    floodFill semantics, used for hole filling); connectivity=8 adds a
    3x3 neighbourhood pass per sweep (matching 8-connected CCL, used by
    the density-probe largest-component fast path). Shared by the
    standalone flood kernel and the fused largest-object kernels.

    `enabled` (traced bool scalar, default on): folded into the
    while_loop condition so a False value runs ZERO sweeps and returns
    the seed unchanged. This is how callers skip the flood behind a
    runtime proof — Mosaic rejects a lax.while_loop nested inside
    lax.cond (verified on-chip r5), so the skip must live in the loop
    condition itself."""
    h, w = mask.shape
    max_row_seg = np.int32(w + 1)
    max_col_seg = np.int32(h + 1)
    # packed segment planes are sweep-invariant; hoist them out of the
    # while_loop body (4 shift/sub full-plane ops saved per sweep)
    rf, rb = row_seg << 1, (max_row_seg - row_seg) << 1
    cf, cb = col_seg << 1, (max_col_seg - col_seg) << 1

    def sweep(reach):
        bit = reach & mask
        f = _doubling_cummax(rf | bit, 1, False)
        b = _doubling_cummax(rb | bit, 1, True)
        bit = ((f & 1) | (b & 1)) & mask
        f = _doubling_cummax(cf | bit, 0, False)
        b = _doubling_cummax(cb | bit, 0, True)
        bit = ((f & 1) | (b & 1)) & mask
        if connectivity == 8:
            nb = _shifted_max(bit, 1, 0, 0)
            nb = _shifted_max_rev(nb, 1, 0, 0)
            nb = _shifted_max(nb, 1, 1, 0)
            nb = _shifted_max_rev(nb, 1, 1, 0)
            bit = nb & mask
        return bit

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        reach, _, it = state
        new = sweep(reach)
        return new, jnp.any(new != reach), it + 1

    init = seed & mask
    first = jnp.bool_(True) if enabled is None else enabled
    reach, _, _ = lax.while_loop(cond, body, (init, first, 0))
    return reach


def _flood_kernel(mask_ref, seed_ref, rowseg_ref, colseg_ref, out_ref, *,
                  max_iters: int):
    out_ref[0] = flood_relax(mask_ref[0], seed_ref[0], rowseg_ref[0],
                             colseg_ref[0], max_iters=max_iters)


@functools.partial(jax.jit, static_argnames=("max_iters", "interpret"))
def flood_from_pallas(masks: jax.Array, seeds: jax.Array,
                      max_iters: int = 128, interpret: bool = False) -> jax.Array:
    """Batched 4-connected flood: (B,H,W) masks+seeds -> reachable bools."""
    b, h, w = masks.shape
    mask_i32 = masks.astype(jnp.int32)
    seed_i32 = (seeds.astype(bool) & masks.astype(bool)).astype(jnp.int32)
    barriers = 1 - mask_i32
    row_seg = jnp.cumsum(barriers, axis=2, dtype=jnp.int32)
    col_seg = jnp.cumsum(barriers, axis=1, dtype=jnp.int32)
    spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_flood_kernel, max_iters=max_iters),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        grid=(b,),
        in_specs=[spec, spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(mask_i32, seed_i32, row_seg, col_seg)
    return out == 1
