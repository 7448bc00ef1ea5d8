"""Pallas TPU kernel: geodesic marker watershed, VMEM-resident.

Same Bellman-Ford relaxation as ops.watershed.marker_watershed, but the
labels/distance planes and the four loop-invariant edge-cost planes stay
in VMEM for the whole loop instead of round-tripping HBM every
iteration. Exits when labels have been stable for `stable_iters`
consecutive sweeps (distances keep refining after assignment converges).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = np.float32(1e30)
_SHIFTS = ((1, 0), (-1, 0), (0, 1), (0, -1))


def _shift(x, dy: int, dx: int, fill):
    h, w = x.shape
    out = x
    if dy:
        out = pltpu.roll(out, dy % h, 0)
        idx = lax.broadcasted_iota(jnp.int32, out.shape, 0)
        cond = idx < dy if dy > 0 else idx >= h + dy
        out = jnp.where(cond, fill, out)
    if dx:
        out = pltpu.roll(out, dx % w, 1)
        idx = lax.broadcasted_iota(jnp.int32, out.shape, 1)
        cond = idx < dx if dx > 0 else idx >= w + dx
        out = jnp.where(cond, fill, out)
    return out


def _watershed_kernel(img_ref, markers_ref, labels_ref, boundary_ref, *,
                      max_iters: int, stable_iters: int):
    img = img_ref[0].astype(jnp.float32)
    labels0 = markers_ref[0]
    dist0 = jnp.where(labels0 > 0, 0.0, _BIG)

    def body(state):
        labels, dist, stable, it = state
        best_d, best_l = dist, labels
        for dy, dx in _SHIFTS:
            # recompute the edge cost per direction instead of holding 4
            # persistent cost planes — keeps 512x512 inside the 16MB VMEM
            # budget (extra shifts are cheap VPU work)
            cost = jnp.abs(img - _shift(img, dy, dx, 0.0)) + 1e-3
            nd = _shift(dist, dy, dx, _BIG)
            nl = _shift(labels, dy, dx, 0)
            cand = nd + cost
            take = (cand < best_d) & (nl > 0)
            best_d = jnp.where(take, cand, best_d)
            best_l = jnp.where(take, nl, best_l)
        changed = jnp.any(best_l != labels)
        stable = jnp.where(changed, 0, stable + 1)
        return best_l, best_d, stable, it + 1

    def cond(state):
        _, _, stable, it = state
        return (stable < stable_iters) & (it < max_iters)

    labels, dist, _, _ = lax.while_loop(
        cond, body, (labels0, dist0, jnp.int32(0), jnp.int32(0))
    )

    boundary = jnp.zeros(labels.shape, jnp.int32)
    for dy, dx in _SHIFTS:
        nl = _shift(labels, dy, dx, 0)
        boundary = boundary | ((nl > 0) & (labels > 0) & (nl != labels)).astype(jnp.int32)
    labels_ref[0] = labels
    boundary_ref[0] = boundary


@functools.partial(jax.jit, static_argnames=("max_iters", "stable_iters", "interpret"))
def marker_watershed_pallas(images: jax.Array, markers: jax.Array,
                            max_iters: int = 1024, stable_iters: int = 8,
                            interpret: bool = False):
    """Batched watershed: (B,H,W) image + int markers -> (labels, boundary)."""
    b, h, w = images.shape
    spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    labels, boundary = pl.pallas_call(
        functools.partial(_watershed_kernel, max_iters=max_iters,
                          stable_iters=stable_iters),
        out_shape=(jax.ShapeDtypeStruct((b, h, w), jnp.int32),
                   jax.ShapeDtypeStruct((b, h, w), jnp.int32)),
        grid=(b,),
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        interpret=interpret,
    )(images.astype(jnp.float32), markers.astype(jnp.int32))
    return labels, boundary == 1
