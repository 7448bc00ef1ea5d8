"""Pallas TPU kernel: geodesic marker watershed, VMEM-resident.

Same min-plus line-scan relaxation as ops.watershed.marker_watershed —
literally the same code: the scan machinery lives once in
ops/geodesic_scan.py, parameterized by the shift primitive (pltpu.roll
here, pad+slice in the XLA path), so the two paths cannot drift and
results are bit-identical. This kernel keeps the distance/label planes
and the two prefix-sum cost planes in VMEM for the whole loop instead
of round-tripping HBM every sweep.

VMEM budget: the MEASURED live footprint is ~16 planes including
loop/scan temporaries (ops/watershed.py dispatches with
_use_pallas(h, w, planes=16)), so 512x512 (16.8 MB tile-padded) is
REJECTED and takes the XLA path — a 512 remote compile of this scan
machinery actually failed (CLAUDE.md, r3-verified). 256x256 and below
fit comfortably. Do not loosen the planes=16 gate without a real
compile check.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cadx_tpu.ops import geodesic_scan as G


def _shift(x, dy: int, dx: int, fill):
    """pltpu.roll-based shift matching ops.watershed._shift semantics.
    pltpu.roll needs non-negative shifts: n - k rolls backwards."""
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
                      max_iters: int, max_scan: int, label_values: tuple):
    img = img_ref[0].astype(jnp.float32)
    if label_values:
        labels = G.relax_to_fixpoint_packed(_shift, img, markers_ref[0],
                                            max_iters, max_scan,
                                            label_values=label_values)
    else:
        labels = G.relax_to_fixpoint(_shift, img, markers_ref[0],
                                     max_iters, max_scan)
    labels_ref[0] = labels
    boundary_ref[0] = G.label_boundary(_shift, labels)


@functools.partial(jax.jit, static_argnames=("max_iters", "max_scan",
                                             "marker_label_values",
                                             "interpret"))
def marker_watershed_pallas(images: jax.Array, markers: jax.Array,
                            max_iters: int = 256, max_scan: int = 256,
                            marker_label_values: tuple = (),
                            interpret: bool = False):
    """Batched watershed: (B,H,W) image + int markers -> (labels, boundary).

    marker_label_values: same packed-relaxation gate as
    ops.watershed.marker_watershed (the two backends must dispatch the
    same variant to stay bit-identical)."""
    b, h, w = images.shape
    packed = (marker_label_values
              if (marker_label_values and
                  G.use_packed((h, w), len(marker_label_values)))
              else ())
    spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    labels, boundary = pl.pallas_call(
        functools.partial(_watershed_kernel, max_iters=max_iters,
                          max_scan=max_scan, label_values=packed),
        out_shape=(jax.ShapeDtypeStruct((b, h, w), jnp.int32),
                   jax.ShapeDtypeStruct((b, h, w), jnp.int32)),
        grid=(b,),
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        interpret=interpret,
    )(images.astype(jnp.float32), markers.astype(jnp.int32))
    return labels, boundary == 1
