"""Pallas TPU kernel: the pectoral-removal tail in ONE VMEM program.

remove_pectoral (customImageCleaner.py:125-157) chains largest-object
selection -> eroded/dilated marker bands -> marker watershed -> ridge
masking -> boundary opening. As separate dispatches that is 2 kernel
launches (largest-object, watershed) plus XLA morphology per image;
per-program launch overhead (~35us/image/kernel) dominates. This kernel
runs the whole tail after histogram equalization in one program,
chaining the SAME phase implementations used by the standalone kernels
(kernels/largest_obj.py phases, ops/geodesic_scan.py watershed sweeps)
so results stay bit-identical to the composed path.

Inputs: equalized image, high-threshold binary mask, breast mask.
Outputs: watershed labels, ridge boundary, opened breast-only mask.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cadx_tpu.kernels.ccl import ccl_relax
from cadx_tpu.kernels.largest_obj import (
    _axis_window_min,
    _fill_holes,
    _opening,
    _segs,
)
from cadx_tpu.kernels.mode import largest_mask_from_labels
from cadx_tpu.kernels.watershed_kernel import _shift
from cadx_tpu.ops import geodesic_scan as G


def _window_min2d(x, k: int, fill):
    out = _axis_window_min(x, k, 0, fill)
    return _axis_window_min(out, k, 1, fill)


def _pectoral_kernel(equ_ref, bin_ref, breast_ref, labels_ref, boundary_ref,
                     mask_ref, *, lbl_bits: int, morph_k: int, n_morph: int,
                     sm_k: int, max_iters: int, ws_max_iters: int,
                     max_scan: int):
    m = bin_ref[0] != 0
    # largest object + hole fill (select_largest_obj(fill, no smooth))
    rs, cs = _segs(m)
    # nb_rounds=8: the high-threshold mask is speckle-heavy and its
    # diagonal chains are round-bound (median 13 sweeps at 1 round,
    # 3-5 at 8; 8.8 -> 5.0 ms/96-batch measured) — see ccl.ccl_relax.
    # scan_cap=32: speckle segments are short, so capped line scans
    # reach the same fixpoint in the same sweeps at ~40% less scan work
    # (r5 on-chip A/B: 5.06 -> 4.32 ms/96 standalone, bit-identical
    # across nb_rounds x cap grid; _scratch/ccl_ab.py)
    labels0 = ccl_relax(m, rs, cs, lbl_bits=lbl_bits, connectivity=8,
                        max_iters=max_iters, nb_rounds=8, scan_cap=32)
    pect = largest_mask_from_labels(labels0, m)
    pect = _fill_holes(pect, max_iters)

    # eroded/dilated marker bands: iterating k x k composes into one
    # (k-1)*n+1 window (odd centered for the cleaner's k=3)
    keff = (morph_k - 1) * n_morph + 1
    p = pect.astype(jnp.int32)
    er = _window_min2d(p, keff, 1)
    di = 1 - _window_min2d(1 - p, keff, 1)

    markers = jnp.zeros(p.shape, jnp.int32)
    markers = jnp.where(er > 0, 255, markers)
    markers = jnp.where(di == 0, 128, markers)
    markers = jnp.where(breast_ref[0] == 0, 64, markers)

    # geodesic watershed (shared scan + relaxation machinery — ONE copy
    # of the while-loop/convergence/boundary logic, geodesic_scan.py).
    # Packed (dist,label) int32 form: this kernel only compiles at
    # <= 256^2 (planes gate), well inside use_packed's budget.
    img = equ_ref[0].astype(jnp.float32)
    labels = G.relax_to_fixpoint_packed(_shift, img, markers, ws_max_iters,
                                        max_scan,
                                        label_values=(255, 128, 64))
    boundary = G.label_boundary(_shift, labels)

    # ridge-masked breast label -> opened breast-only mask
    mask128 = (boundary == 0) & (labels == 128)
    opened = _opening(mask128, sm_k)

    labels_ref[0] = labels
    boundary_ref[0] = boundary
    mask_ref[0] = opened.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=(
    "morph_k", "n_morph", "sm_k", "max_iters", "ws_max_iters", "max_scan",
    "interpret"))
def pectoral_tail_pallas(img_equ: jax.Array, img_bin: jax.Array,
                         breast_mask: jax.Array, morph_k: int = 3,
                         n_morph: int = 7, sm_k: int = 25,
                         max_iters: int = 128, ws_max_iters: int = 256,
                         max_scan: int = 8, interpret: bool = False):
    """Batched: (B,H,W) equalized image + high-threshold mask + breast
    mask -> (labels, boundary bool, opened breast-only mask bool).
    H, W must be powers of two (bitonic mode phase).

    max_scan=8: the watershed's unlabeled band between the marker bands
    is narrow, and capped scan windows reach the SAME exact fixpoint
    (ops/geodesic_scan.scan_min_carry) — r5 on-chip A/B over the scan
    8/16/32/64 grid was bit-identical with 8 fastest (8.22 vs 8.76
    ms/96 standalone, _scratch/pectoral_ab.py)."""
    b, h, w = img_equ.shape
    if (h & (h - 1)) or (w & (w - 1)):
        raise ValueError(f"fused kernel needs power-of-two dims, got {h}x{w}")
    if morph_k % 2 == 0 and n_morph > 1:
        # the fused marker-band window anchors at keff//2, which matches
        # the XLA composed-window anchor ((k//2)*n) only for odd k
        raise ValueError(
            f"fused pectoral tail requires odd morph_k for n_morph>1 "
            f"(got k={morph_k}); use the composed remove_pectoral path")
    lbl_bits = int(np.ceil(np.log2(h * w + 1)))
    spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    labels, boundary, mask = pl.pallas_call(
        functools.partial(_pectoral_kernel, lbl_bits=lbl_bits,
                          morph_k=morph_k, n_morph=n_morph, sm_k=sm_k,
                          max_iters=max_iters, ws_max_iters=ws_max_iters,
                          max_scan=max_scan),
        out_shape=(jax.ShapeDtypeStruct((b, h, w), jnp.int32),
                   jax.ShapeDtypeStruct((b, h, w), jnp.int32),
                   jax.ShapeDtypeStruct((b, h, w), jnp.int32)),
        grid=(b,),
        in_specs=[spec, spec, spec],
        out_specs=(spec, spec, spec),
        interpret=interpret,
    )(img_equ.astype(jnp.int32), img_bin.astype(jnp.int32),
      breast_mask.astype(jnp.int32))
    return labels, boundary == 1, mask == 1
