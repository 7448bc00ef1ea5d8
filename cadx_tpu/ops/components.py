"""Connected components / flood-fill on TPU via label propagation.

cv2.connectedComponentsWithStats + floodFill (reference
customImageCleaner.py:60-82) are irregular pointer-chasing algorithms on
CPU. The TPU-native formulation: every foreground pixel starts labeled
with its own linear index and labels relax to the component minimum via

- segmented min-scans along rows and columns, plus
- a 3x3 window min for diagonal (8-connectivity) hops,

iterated inside a lax.while_loop until a fixed point. Convergence takes
O(component "turns"), not O(diameter) — a handful of sweeps for real
masks.

Fast path: the segmented scan is a SINGLE lax.cummin over int32 values
packed as (segment_id << label_bits) | label. Within a segment the high
bits are constant so cummin minimizes the label; across segments the
ordering of segment ids (inverted for the forward direction) guarantees
foreign values never win. One packed cummin replaces a two-tuple
associative_scan — ~4-5x faster on TPU. Falls back to the tuple scan
when H*W is too large to pack into 31 bits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# concrete (non-traced) sentinel so reduce_window's monoid-identity check
# stays a Python bool under tracing
_INF = np.int32(2**30)


def _segmented_min_scan(vals: jax.Array, barriers: jax.Array, axis: int,
                        reverse: bool) -> jax.Array:
    """Generic segmented min-scan (tuple form) — fallback for huge images."""

    def op(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf, bv, jnp.minimum(av, bv)), af | bf

    out, _ = lax.associative_scan(op, (vals, barriers), axis=axis, reverse=reverse)
    return out


def _sweep_tuple(labels: jax.Array, mask: jax.Array, connectivity: int) -> jax.Array:
    barriers = ~mask
    vals = jnp.where(mask, labels, _INF)
    for axis in (1, 0):
        for reverse in (False, True):
            vals = _segmented_min_scan(vals, barriers, axis, reverse)
            vals = jnp.where(mask, vals, _INF)
    if connectivity == 8:
        nb = lax.reduce_window(
            vals, _INF, lax.min, (3, 3), (1, 1), ((1, 1), (1, 1))
        )
        vals = jnp.where(mask, jnp.minimum(vals, nb), _INF)
    return vals


def _make_packed_sweep(mask: jax.Array, connectivity: int, lbl_bits: int):
    """Packed-cummin sweep closure; barrier segment ids precomputed once."""
    h, w = mask.shape
    lbl_mask = np.int32((1 << lbl_bits) - 1)
    barriers = (~mask).astype(jnp.int32)
    row_seg = jnp.cumsum(barriers, axis=1)
    col_seg = jnp.cumsum(barriers, axis=0)
    max_row_seg = np.int32(w + 1)
    max_col_seg = np.int32(h + 1)

    def sweep(labels):
        vals = jnp.where(mask, labels, lbl_mask)
        p = ((max_row_seg - row_seg) << lbl_bits) | vals
        f = lax.cummin(p, axis=1) & lbl_mask
        p = (row_seg << lbl_bits) | vals
        b = lax.cummin(p, axis=1, reverse=True) & lbl_mask
        vals = jnp.where(mask, jnp.minimum(f, b), lbl_mask)
        p = ((max_col_seg - col_seg) << lbl_bits) | vals
        f = lax.cummin(p, axis=0) & lbl_mask
        p = (col_seg << lbl_bits) | vals
        b = lax.cummin(p, axis=0, reverse=True) & lbl_mask
        vals = jnp.where(mask, jnp.minimum(f, b), lbl_mask)
        if connectivity == 8:
            nb = lax.reduce_window(
                vals, lbl_mask, lax.min, (3, 1), (1, 1), ((1, 1), (0, 0))
            )
            nb = lax.reduce_window(
                nb, lbl_mask, lax.min, (1, 3), (1, 1), ((0, 0), (1, 1))
            )
            vals = jnp.where(mask, jnp.minimum(vals, nb), lbl_mask)
        return vals

    return sweep, int(lbl_mask)


def _label_bits(h: int, w: int) -> int:
    # sentinel (1<<bits)-1 must exceed the largest label h*w-1
    return int(np.ceil(np.log2(h * w + 1)))


def _use_pallas(h: int, w: int, planes: int = 10) -> bool:
    """Dispatch to the VMEM-resident Pallas kernels on TPU for images big
    enough to tile cleanly yet small enough to fit the whole relaxation
    in VMEM (~16MB/core budget; `planes` = concurrent full-image int32/f32
    buffers the kernel holds incl. loop temporaries). The budget uses
    TILE-PADDED dims (sublanes round to 8, lanes to 128): a 517x517 plane
    occupies 520x640 in VMEM — the round-2 scan watershed OOM'd the
    Mosaic stack at such sizes when this used raw dims. Bit-identical
    results either way. CADX_DISABLE_PALLAS=1 forces the XLA path."""
    import os

    if os.environ.get("CADX_DISABLE_PALLAS") == "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    seg_bits = int(np.ceil(np.log2(max(h, w) + 2)))
    if _label_bits(h, w) + seg_bits > 30:
        return False
    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    vmem_bytes = hp * wp * 4 * planes
    return min(h, w) >= 128 and vmem_bytes <= 14 * 1024 * 1024


def _label_core(mask: jax.Array, connectivity: int, max_iters: int,
                init: jax.Array | None = None) -> jax.Array:
    h, w = mask.shape
    lbl_bits = _label_bits(h, w)
    seg_bits = int(np.ceil(np.log2(max(h, w) + 2)))
    use_packed = lbl_bits + seg_bits <= 31

    own = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    if use_packed:
        sweep, sentinel = _make_packed_sweep(mask, connectivity, lbl_bits)
        sentinel = np.int32(sentinel)
    else:
        sweep = lambda l: _sweep_tuple(l, mask, connectivity)  # noqa: E731
        sentinel = _INF
    start = own if init is None else jnp.minimum(own, init)
    start = jnp.where(mask, start, sentinel)

    def cond(state):
        labels, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        labels, _, it = state
        new = sweep(labels)
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = lax.while_loop(cond, body, (start, jnp.bool_(True), 0))
    return labels


@functools.partial(jax.jit, static_argnames=("connectivity", "max_iters"))
def label_components(mask: jax.Array, connectivity: int = 8,
                     max_iters: int = 128) -> jax.Array:
    """Label connected True-regions of a (H, W) bool mask.

    Returns int32 (H, W): foreground pixels share their component's
    minimum linear index; background pixels hold a sentinel >= H*W.

    Multigrid: a 4x-coarse labeling of all-foreground blocks seeds the
    fine labeling (any full block is internally connected, and adjacent
    full blocks are connected at fine level, so the coarse hint is a
    valid same-component upper bound). The fine loop still runs to a
    fixed point, so results are exact — the hint only cuts iterations.
    """
    h, w = mask.shape
    mask = mask.astype(bool)

    if _use_pallas(h, w):
        from cadx_tpu.kernels.ccl import label_components_pallas

        return label_components_pallas(mask[None], connectivity, max_iters)[0]

    init = None
    if h % 4 == 0 and w % 4 == 0 and min(h, w) >= 64:
        cmask = mask.reshape(h // 4, 4, w // 4, 4).all(axis=(1, 3))
        clabels = _label_core(cmask, connectivity, max_iters)
        wc = w // 4
        cy, cx = clabels // wc, clabels % wc
        fine_root = cy * 4 * w + cx * 4
        n = h * w
        hint = jnp.where(cmask, fine_root, n)  # n > any fine label
        init = jnp.repeat(jnp.repeat(hint, 4, axis=0), 4, axis=1).astype(jnp.int32)

    return _label_core(mask, connectivity, max_iters, init)


def component_areas(labels: jax.Array, mask: jax.Array) -> jax.Array:
    """Pixel count per component, indexed by the component's root label."""
    h, w = labels.shape
    n = h * w
    flat = jnp.where(mask.reshape(-1), labels.reshape(-1), n).astype(jnp.int32)
    return jnp.zeros((n + 1,), jnp.int32).at[flat].add(1)[:n]


def _mode_label(labels: jax.Array, mask: jax.Array) -> jax.Array:
    """Most frequent foreground label via sort + run-length (TPU sorts
    beat scatter-add histograms for 2^16-sized label spaces)."""
    h, w = labels.shape
    n = h * w
    sentinel = np.int32(n)
    flat = jnp.where(mask.reshape(-1), labels.reshape(-1), sentinel)
    s = jnp.sort(flat)
    idx = jnp.arange(n, dtype=jnp.int32)
    start = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    start_pos = jnp.where(start, idx, sentinel)
    nxt = lax.cummin(start_pos, axis=0, reverse=True)   # first run start >= p
    nxt_after = jnp.concatenate([nxt[1:], jnp.full((1,), n, jnp.int32)])
    runlen = jnp.where(start & (s < sentinel), nxt_after - idx, -1)
    return s[jnp.argmax(runlen)]


@functools.partial(jax.jit, static_argnames=("connectivity", "max_iters"))
def largest_component(mask: jax.Array, connectivity: int = 8,
                      max_iters: int = 128) -> jax.Array:
    """Bool mask of the largest connected foreground object.

    Mirrors select_largest_obj's connectedComponentsWithStats + argmax
    area over non-background labels (customImageCleaner.py:62-66).
    """
    mask = mask.astype(bool)
    h, w = mask.shape
    labels = label_components(mask, connectivity, max_iters)
    if _use_pallas(h, w) and not (h & (h - 1)) and not (w & (w - 1)):
        # VMEM bitonic sort + run-length (bit-identical to _mode_label,
        # ~3x faster) — needs power-of-two dims for the raster network
        from cadx_tpu.kernels.mode import largest_component_mask_pallas

        return largest_component_mask_pallas(labels[None], mask[None])[0]
    best = _mode_label(labels, mask)
    return mask & (labels == best)


@functools.partial(jax.jit, static_argnames=("max_iters",))
def flood_from(mask: jax.Array, seed: jax.Array, max_iters: int = 128) -> jax.Array:
    """Pixels of `mask` 4-connected to `seed` (binary flood fill).

    Boolean analogue of the labeling sweep: one bit of payload packed
    under the segment id, propagated with cummax scans along rows and
    columns inside a while_loop — far cheaper than a full labeling.
    """
    mask = mask.astype(bool)
    h, w = mask.shape
    if _use_pallas(h, w):
        from cadx_tpu.kernels.flood import flood_from_pallas

        return flood_from_pallas(mask[None], seed.astype(bool)[None], max_iters)[0]
    barriers = (~mask).astype(jnp.int32)
    row_seg = jnp.cumsum(barriers, axis=1)
    col_seg = jnp.cumsum(barriers, axis=0)
    max_row_seg = np.int32(w + 1)
    max_col_seg = np.int32(h + 1)

    # packed segment planes are sweep-invariant; hoisted out of the loop
    rf, rb = row_seg << 1, (max_row_seg - row_seg) << 1
    cf, cb = col_seg << 1, (max_col_seg - col_seg) << 1

    def sweep(reach):
        bit = (reach & mask).astype(jnp.int32)
        # forward cummax: earlier segments have smaller high bits -> lose
        f = lax.cummax(rf | bit, axis=1)
        b = lax.cummax(rb | bit, axis=1, reverse=True)
        bit = ((f & 1) | (b & 1)) & mask.astype(jnp.int32)
        f = lax.cummax(cf | bit, axis=0)
        b = lax.cummax(cb | bit, axis=0, reverse=True)
        return (((f & 1) | (b & 1)) == 1) & mask

    def cond(state):
        reach, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        reach, _, it = state
        new = sweep(reach)
        return new, jnp.any(new != reach), it + 1

    reach, _, _ = lax.while_loop(
        cond, body, (seed.astype(bool) & mask, jnp.bool_(True), 0)
    )
    return reach


@functools.partial(jax.jit, static_argnames=("max_iters",))
def fill_holes(mask: jax.Array, max_iters: int = 128) -> jax.Array:
    """Fill background regions not connected to the image border.

    Equivalent to the reference's floodFill-from-background +
    bitwise_not trick (customImageCleaner.py:69-76): flood the inverse
    mask from the border (4-connectivity, floodFill default); unreached
    inverse pixels are holes and get filled.
    """
    mask = mask.astype(bool)
    h, w = mask.shape

    # No-holes certificate: a hole pixel needs mask strictly left AND
    # right in its row (else it walks along the row to the border), so
    # single-run rows — or columns — prove hole-freeness and the flood
    # is skipped (XLA cond runs only the taken branch). Mirrors
    # kernels/largest_obj.single_run_certificate; results identical.
    m = mask.astype(jnp.int32)
    left = jnp.pad(m[:, :-1], ((0, 0), (1, 0)))
    up = jnp.pad(m[:-1, :], ((1, 0), (0, 0)))
    rows_ok = jnp.max(jnp.sum(m & (1 - left), axis=1)) <= 1
    cols_ok = jnp.max(jnp.sum(m & (1 - up), axis=0)) <= 1

    def flood(mb):
        inv = ~mb
        border = jnp.zeros((h, w), bool).at[0, :].set(True).at[-1, :].set(True)
        border = border.at[:, 0].set(True).at[:, -1].set(True)
        reaches_border = flood_from(inv, border & inv, max_iters)
        holes = inv & ~reaches_border
        return mb | holes

    return lax.cond(rows_ok | cols_ok, lambda mb: mb, flood, mask)
