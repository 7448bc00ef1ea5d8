"""Pallas TPU kernel: largest-component selection (area mode) in VMEM.

After CCL labeling, `ops.components.largest_component` needs the label
with the most pixels (cv2's argmax over connectedComponentsWithStats
areas, customImageCleaner.py:62-66). The XLA formulation (sort 65536
int32 + run-length + argmax) costs ~7ms/batch at 256x256x128 — ~35% of
the whole cleaning stage, and it runs three times per image. This
kernel keeps the plane in VMEM and runs

1. a full bitonic sort over the raster-flattened labels (the (H, W)
   plane IS the linear order: i = r*W + c). Compare-exchange partners
   i^j for the power-of-two stage distance j are reached with
   pltpu.roll along lanes (j < W) or sublanes (j >= W); stage loops are
   lax.fori_loop with dynamic shifts so the ~log^2(N) stages don't
   accumulate Mosaic stack transients;
2. run-length encoding in raster order (doubling reverse-cummin of
   next-start positions), then argmax of run length with smallest-label
   tie-break — bit-identical to ops.components._mode_label's
   sort + jnp.argmax (first maximum in ascending label order);
3. emits the final boolean mask (mask & (labels == best)) directly, so
   the labels plane never round-trips HBM.

Results are bit-identical to the XLA path (sorting is exact; tie-break
matches).

r3: the sort is now the FALLBACK. The production path proves the
argmax without sorting: exact areas of the K longest-run candidate
components plus a 16-group label-partition pixel count bound every
uncounted component strictly below the best candidate
(largest_mask_from_labels below). On mammogram masks — including the
pectoral high-threshold mask, whose largest component is only ~28% of
the mask so the earlier half-total proof never fired — the certificate
fires 96/96 and the 136-stage sort is skipped (2.6+ ms/96-batch saved);
adversarial masks still take the exact sort.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SENTINEL = np.int32(2**30)


def _row_iota(shape):
    return lax.broadcasted_iota(jnp.int32, shape, 0)


def _col_iota(shape):
    return lax.broadcasted_iota(jnp.int32, shape, 1)


def _partner(v, j, axis: int):
    """Value at index (i XOR j) along `axis`, j a power-of-two < size
    (static int or traced scalar — static keeps the roll a single
    hardware rotate). i^j = i+j where bit j of i is 0, else i-j."""
    n = v.shape[axis]
    idx = lax.broadcasted_iota(jnp.int32, v.shape, axis)
    bit = (idx & j) != 0
    back = (n - j) if isinstance(j, int) else (jnp.int32(n) - j)
    up = pltpu.roll(v, back, axis)               # brings index i+j
    down = pltpu.roll(v, j, axis)                # brings index i-j
    return jnp.where(bit, down, up)


def _bitonic_sort_plane(v, static_unroll: bool = True):
    """Ascending bitonic sort of the raster-flattened (H, W) int32 plane.

    static_unroll=True emits every stage with a STATIC roll shift
    (dynamic-shift lane rotations lower to multi-step shuffle networks on
    Mosaic — measured at parity with XLA's HBM sort, i.e. ~4x slower
    than static shifts); False wraps stages in fori_loops with dynamic
    shifts (bounded Mosaic stack, used if unrolling ever blows it)."""
    h, w = v.shape
    n = h * w
    levels = int(np.log2(n))  # h, w are powers of two (gated by caller)
    r_iota = _row_iota(v.shape)
    c_iota = _col_iota(v.shape)
    log_w = int(np.log2(w))

    for lk in range(1, levels + 1):  # k = 2**lk
        k = 1 << lk
        # ascending block mask: (i & k) == 0
        if k < w:
            asc = (c_iota & k) == 0
        elif k < n:
            asc = (r_iota & (k >> log_w)) == 0
        else:
            asc = jnp.ones(v.shape, bool)  # final full-length merge

        def stage(v, j, axis):
            vp = _partner(v, j, axis)
            idx = c_iota if axis == 1 else r_iota
            is_lower = (idx & j) == 0
            keep_min = is_lower == asc
            return jnp.where(keep_min, jnp.minimum(v, vp), jnp.maximum(v, vp))

        n_row_stages = max(0, lk - log_w)     # j = k/2 ... w
        first_lane_j = min(k // 2, w // 2)    # then j = ... 1
        n_lane_stages = int(np.log2(first_lane_j)) + 1 if first_lane_j else 0

        if static_unroll:
            for t in range(n_row_stages):
                v = stage(v, (k >> (t + 1)) >> log_w, 0)
            for t in range(n_lane_stages):
                v = stage(v, first_lane_j >> t, 1)
            continue

        def row_body(t, v):
            j_row = (jnp.int32(k) >> (t + 1)) >> log_w  # (k/2 >> t) / w
            return stage(v, j_row, 0)

        if n_row_stages:
            v = lax.fori_loop(0, n_row_stages, row_body, v)

        def lane_body(t, v):
            j_lane = jnp.int32(first_lane_j) >> t
            return stage(v, j_lane, 1)

        if n_lane_stages:
            v = lax.fori_loop(0, n_lane_stages, lane_body, v)
    return v


def _raster_prev(s, fill):
    """Previous element in raster order: (r, c-1), wrapping to
    (r-1, W-1); index 0 gets `fill`."""
    h, w = s.shape
    p1 = pltpu.roll(s, 1, 1)            # (r, c-1); c=0 gets (r, W-1)
    p2 = pltpu.roll(p1, 1, 0)           # (r-1, W-1) at c=0
    c = _col_iota(s.shape)
    r = _row_iota(s.shape)
    prev = jnp.where(c == 0, p2, p1)
    return jnp.where((r == 0) & (c == 0), fill, prev)


def _raster_shift_ahead(x, d: int, fill):
    """x at raster index i+d (static power-of-two d), fill past the end."""
    h, w = x.shape
    c = _col_iota(x.shape)
    r = _row_iota(x.shape)
    if d >= w:
        m = d // w
        y = pltpu.roll(x, h - m, 0)     # (r+m, c)
        return jnp.where(r >= h - m, fill, y)
    y = pltpu.roll(x, w - d, 1)         # (r, (c+d) % w)
    z = pltpu.roll(y, h - 1, 0)         # (r+1, (c+d) % w)
    out = jnp.where(c < w - d, y, z)
    past = (r == h - 1) & (c >= w - d)  # i+d beyond the last pixel
    return jnp.where(past, fill, out)


def _reverse_cummin_raster(x, fill):
    """Suffix min in raster order via shift-doubling (static shifts)."""
    h, w = x.shape
    d = 1
    while d < h * w:
        x = jnp.minimum(x, _raster_shift_ahead(x, d, fill))
        d *= 2
    return x


def _sort_best_label(labels, mask):
    """Exact argmax-area label via full bitonic sort + run-length."""
    h, w = labels.shape
    n = h * w

    s = _bitonic_sort_plane(jnp.where(mask, labels, _SENTINEL))

    # run-length in raster order (mirrors ops.components._mode_label)
    r = _row_iota(s.shape)
    c = _col_iota(s.shape)
    idx = r * w + c
    start = s != _raster_prev(s, jnp.int32(-1))   # -1 < any label: idx 0 starts
    start_pos = jnp.where(start, idx, jnp.int32(n))
    nxt = _reverse_cummin_raster(start_pos, jnp.int32(n))  # first start >= i
    nxt_after = _raster_shift_ahead(nxt, 1, jnp.int32(n))  # first start > i
    runlen = jnp.where(start & (s < _SENTINEL), nxt_after - idx, jnp.int32(-1))

    # argmax run length; ties -> smallest label (first max in sorted order)
    rmax = jnp.max(runlen)
    return jnp.min(jnp.where((runlen == rmax) & (runlen > 0), s, _SENTINEL))


_CAND_K = 8     # exact areas computed for the K longest-run candidates
_N_GROUPS = 16  # label-high-bits partition for the residual certificate


def _row_runlen(mask):
    """Per-pixel length of the pixel's horizontal mask run (0 outside
    the mask): barrier-count segments via doubling cumsum, then packed
    segmented cummin/cummax of the column index (the CCL row-scan
    trick) give each run's start and end columns."""
    h, w = mask.shape
    m = mask.astype(jnp.int32)
    c = _col_iota(m.shape)
    from cadx_tpu.kernels.ccl import cumsum_i32

    # seg id = #barriers at-or-left (doubling inclusive cumsum)
    seg = cumsum_i32(1 - m, 1)
    col_bits = int(np.ceil(np.log2(w + 1)))
    col_mask = np.int32((1 << col_bits) - 1)
    big = np.int32(2**30)
    max_seg = np.int32(w + 1)
    from cadx_tpu.kernels.ccl import _doubling_cummin

    # the inclusive barrier cumsum puts each run's LEFT barrier in the
    # run's segment; sentinel the column value at non-mask pixels so the
    # segmented min/max see run pixels only (else every run not touching
    # column 0 over-counts by one)
    cval = jnp.where(mask, c, col_mask)
    rval = jnp.where(mask, w - 1 - c, col_mask)
    start = (_doubling_cummin(((max_seg - seg) << col_bits) | cval, 1, False, big)
             & col_mask)
    rev = (_doubling_cummin((seg << col_bits) | rval, 1, True, big)
           & col_mask)
    end = w - 1 - rev
    return jnp.where(mask, end - start + 1, 0)


def _topk_run_best(labels, mask):
    """(provable, best_label): exact argmax-area label when provable.

    Tier 1: the longest-run candidate's exact area beats half the mask
    (the classic majority proof) — fires at the blob-dominated
    suppress/segment call sites and costs only the run-length plane
    plus three reduces. Tier 2 (lax.cond, lazily evaluated) is the
    group-residual certificate below for sub-majority masks.

    Tier-2 candidates: the K components with the longest horizontal runs —
    picked by iterated masked max over the run-length plane (scalar
    reduces are cheap on this VPU, ~8us/96-batch each; the r3 v1 of
    this path extracted a (32,32) probe grid and mini-bitonic-sorted
    it, but small-plane sort stages are issue-bound, not size-bound:
    the 55-stage minisort alone cost 0.68ms/96-batch, measured). Their
    areas are computed EXACTLY; best = max area, min-label tie-break.

    Certificate: every component carries ONE label (its min raster
    index), so `labels >> (lbl_bits-4)` partitions components into 16
    groups. Count the mask pixels per group, subtract the K counted
    areas from their groups: any UNcounted component fits inside its
    group's residual, so `best_area > max(residual)` proves `best` is
    the unique global argmax (strictness also rules out uncounted
    ties; counted ties are resolved exactly by min label, matching
    ops._mode_label). Mammogram high-threshold masks — one ~2000px
    blob + ~1500 speckle components spread over all label groups —
    certify with >1000px margin (measured); adversarial masks fall
    back to the exact sort. Candidate CHOICE never affects soundness:
    bad candidates only weaken the bound."""
    h, w = labels.shape
    # labels are raster indices <= h*w - 1, so they need ceil(log2(h*w))
    # bits (NOT the packed-encoding lbl_bits, which reserves one more for
    # the background sentinel — deriving the shift from that constant
    # left groups 8-15 permanently empty and the bound ~2x looser)
    shift = max(0, int(np.ceil(np.log2(h * w))) - 4)

    rl = _row_runlen(mask)
    rmax = jnp.max(rl)
    cand1 = jnp.min(jnp.where((rl == rmax) & (rl > 0), labels, _SENTINEL))
    valid1 = cand1 < _SENTINEL
    area1 = jnp.where(
        valid1, jnp.sum(jnp.where(mask & (labels == cand1), 1, 0)), 0)
    total = jnp.sum(jnp.where(mask, 1, 0))
    # tier 1: half-total majority proof with the longest-run candidate —
    # fires at the blob-dominated call sites (breast >50% of mask) and
    # skips the K-candidate loop + group counts entirely
    tier1 = valid1 & (area1 * 2 > total)

    def tier2():
        grp = jnp.where(mask, labels >> shift, jnp.int32(_N_GROUPS))
        best_lab, best_area = cand1, jnp.where(valid1, area1, -1)
        picks = [(cand1, area1)]
        rl2 = jnp.where(labels == cand1, 0, rl)
        for _ in range(_CAND_K - 1):
            rmax_k = jnp.max(rl2)
            lab_k = jnp.min(
                jnp.where((rl2 == rmax_k) & (rl2 > 0), labels, _SENTINEL))
            valid = lab_k < _SENTINEL
            area_k = jnp.where(
                valid, jnp.sum(jnp.where(mask & (labels == lab_k), 1, 0)), 0)
            picks.append((lab_k, area_k))
            take = valid & ((area_k > best_area)
                            | ((area_k == best_area) & (lab_k < best_lab)))
            best_lab = jnp.where(take, lab_k, best_lab)
            best_area = jnp.where(take, area_k, best_area)
            rl2 = jnp.where(labels == lab_k, 0, rl2)

        bound = jnp.int32(-1)
        for g in range(_N_GROUPS):
            cnt_g = jnp.sum(jnp.where(grp == g, 1, 0))
            for lab_k, area_k in picks:
                cnt_g = cnt_g - jnp.where((lab_k >> shift) == g, area_k, 0)
            bound = jnp.maximum(bound, cnt_g)
        return best_area > bound, best_lab

    provable, best_lab = lax.cond(
        tier1, lambda: (jnp.bool_(True), cand1), tier2)
    return provable, best_lab


def largest_mask_from_labels(labels, mask):
    """In-kernel argmax-area selection: (h, w) i32 CCL labels + bool mask
    -> bool mask of the largest component, bit-identical to
    ops._mode_label (smallest-label tie-break). Shared by the standalone
    mode kernel and the fused largest-object/cleaner kernels.

    Fast path (r3): the top-K run proof above — r3's earlier
    half-total majority proof never fired at the pectoral call site
    (largest component ~28% of the high-threshold mask, measured), so
    all images still paid the 136-stage sort there. The group-residual
    proof certifies sub-majority argmaxes too; the exact sort remains
    the fallback for adversarial masks, so the result is exact either
    way (lax.cond branches lazily in Mosaic — only the taken branch
    runs)."""
    provable, cand = _topk_run_best(labels, mask)
    best = lax.cond(provable,
                    lambda: cand,
                    lambda: _sort_best_label(labels, mask))
    return mask & (labels == best)


def _mode_mask_kernel(labels_ref, mask_ref, out_ref):
    out_ref[0] = largest_mask_from_labels(
        labels_ref[0], mask_ref[0] != 0).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def largest_component_mask_pallas(labels: jax.Array, masks: jax.Array,
                                  interpret: bool = False) -> jax.Array:
    """Batched: (B,H,W) int32 CCL labels + bool masks -> bool mask of the
    largest component per image. H, W must be powers of two (the caller's
    _use_pallas gate only admits such sizes at TPU image scales)."""
    b, h, w = labels.shape
    if (h & (h - 1)) or (w & (w - 1)):
        raise ValueError(f"mode kernel needs power-of-two dims, got {h}x{w}")
    spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _mode_mask_kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        grid=(b,),
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(labels.astype(jnp.int32), masks.astype(jnp.int32))
    return out == 1
