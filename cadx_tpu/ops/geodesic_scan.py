"""Shared min-plus line-scan machinery for the geodesic watershed.

Both watershed paths — the XLA one (ops/watershed.py, pad+slice shifts)
and the VMEM Pallas kernel (kernels/watershed_kernel.py, pltpu.roll
shifts) — run the exact same relaxation; their bit-identical contract
used to rest on two hand-synchronized copies of ~50 lines. This module
is the single implementation, parameterized by the backend's
`shift(x, dy, dx, fill)` primitive. Every float op (shift-doubling
cummin/cumsum order, strict-< takes, the +1e-3 edge epsilon) lives here
once, so the association order cannot drift between paths.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

BIG = np.float32(1e30)


def doubling_steps(n: int):
    """Shift offsets 1, 2, 4, ... covering a window of >= n."""
    steps, k = [], 1
    while k < n:
        steps.append(k)
        k *= 2
    return tuple(steps)


def scan_min_carry(shift, w, l, axis: int, reverse: bool, max_scan: int):
    """Running min of w along `axis` (prefix if not reverse, suffix if
    reverse) over a window of up to max_scan, carrying the label of the
    argmin. Strict < keeps the nearest minimiser on ties. A capped
    window (< axis length) only bounds how far an improvement travels
    per sweep — the fixpoint is unchanged and still exact, and real
    pectoral bands converge in the same few sweeps at ~25% fewer rolls."""
    n = min(w.shape[axis], max_scan)
    sgn = 1 if not reverse else -1
    for k in doubling_steps(n):
        dy, dx = (sgn * k, 0) if axis == 0 else (0, sgn * k)
        w_sh = shift(w, dy, dx, BIG)
        l_sh = shift(l, dy, dx, 0)
        take = w_sh < w
        w = jnp.where(take, w_sh, w)
        l = jnp.where(take, l_sh, l)
    return w, l


def doubling_cumsum(shift, x, axis: int):
    """Inclusive prefix sum via shift-doubling adds — one association
    order for both backends."""
    for k in doubling_steps(x.shape[axis]):
        dy, dx = (k, 0) if axis == 0 else (0, k)
        x = x + shift(x, dy, dx, 0.0)
    return x


def axis_costs(shift, img):
    """Loop-invariant inter-pixel costs and their prefix sums.

    crow[i, j] = cost of stepping between (i, j-1) and (i, j); the first
    column is 0 so srow = cumsum(crow) satisfies
    srow[i, j] - srow[i, k] = path cost k -> j along row i.
    """
    eps = np.float32(1e-3)
    crow = jnp.abs(img - shift(img, 0, 1, 0.0)) + eps
    col_idx = lax.broadcasted_iota(jnp.int32, img.shape, 1)
    crow = jnp.where(col_idx == 0, 0.0, crow)
    ccol = jnp.abs(img - shift(img, 1, 0, 0.0)) + eps
    row_idx = lax.broadcasted_iota(jnp.int32, img.shape, 0)
    ccol = jnp.where(row_idx == 0, 0.0, ccol)
    return doubling_cumsum(shift, crow, 1), doubling_cumsum(shift, ccol, 0)


def sweep(shift, d, l, srow, scol, max_scan: int):
    """One Gauss-Seidel sweep: LR, RL, TB, BT line relaxations.

    left-to-right relaxes d'[i] = min(d[i], min_{j<i}(d[j] - s[j]) + s[i]);
    right-to-left uses min_{j>i}(d[j] + s[j]) - s[i]; then the same along
    columns — each scan sees the previous scan's updates."""
    w, lw = scan_min_carry(shift, d - srow, l, 1, False, max_scan)
    cand = w + srow
    take = cand < d
    d, l = jnp.where(take, cand, d), jnp.where(take, lw, l)
    w, lw = scan_min_carry(shift, d + srow, l, 1, True, max_scan)
    cand = w - srow
    take = cand < d
    d, l = jnp.where(take, cand, d), jnp.where(take, lw, l)
    w, lw = scan_min_carry(shift, d - scol, l, 0, False, max_scan)
    cand = w + scol
    take = cand < d
    d, l = jnp.where(take, cand, d), jnp.where(take, lw, l)
    w, lw = scan_min_carry(shift, d + scol, l, 0, True, max_scan)
    cand = w - scol
    take = cand < d
    d, l = jnp.where(take, cand, d), jnp.where(take, lw, l)
    return d, l


def relax_to_fixpoint(shift, img, markers, max_iters: int, max_scan: int):
    """Run Gauss-Seidel sweeps to the distance fixpoint -> final labels.
    Shared by the standalone watershed kernel and the fused pectoral
    kernel (one copy of the while-loop/convergence logic)."""
    dist0 = jnp.where(markers > 0, 0.0, BIG)
    srow, scol = axis_costs(shift, img)

    def body(state):
        labels, dist, _, it = state
        new_d, new_l = sweep(shift, dist, labels, srow, scol, max_scan)
        return new_l, new_d, jnp.any(new_d != dist), it + 1

    def cond(state):
        _, _, changed, it = state
        return changed & (it < max_iters)

    labels, _, _, _ = lax.while_loop(
        cond, body, (markers, dist0, jnp.bool_(True), jnp.int32(0)))
    return labels


def _pack_params(h: int, w: int):
    """Static packing constants for the int32 (distance, label) form.

    Two-key metric: primary = sum of integer |gradient| steps, secondary
    = path length (the float form's +1e-3 step epsilon). K = next power
    of two above the longest rectilinear path keeps the keys separate:
    dist_q = K * sum|grad| + n. The label rides in the low 2 bits:
    pk = (dist_q << 2) | label. Worst case at 512x512:
    K * (h+w) * 255 = 1024*1024*255 < 2^28, so BIG_PK = 2^30 and
    BIG_PK + (srow << 2) stays under 2^31 — no int32 overflow. Beyond
    512 the budget breaks; use_packed() gates dispatch."""
    k = 1
    while k < h + w:
        k *= 2
    return k, np.int32(1 << 30)


def use_packed(shape, n_marker_labels: int) -> bool:
    """Static gate for the packed relaxation: labels must fit 2 bits and
    the quantized distances must fit int32 (see _pack_params)."""
    return max(shape) <= 512 and n_marker_labels <= 3


def axis_costs_packed(shift, img, k: int):
    """Integer axis costs, packed units (<< 2 for the label bits).

    Requires an integer-valued image (the equalize stage's output is);
    values are rounded so both backends quantize identically."""
    q = jnp.round(img).astype(jnp.int32)
    crow = jnp.abs(q - shift(q, 0, 1, 0)) * k + 1
    col_idx = lax.broadcasted_iota(jnp.int32, img.shape, 1)
    crow = jnp.where(col_idx == 0, 0, crow)
    ccol = jnp.abs(q - shift(q, 1, 0, 0)) * k + 1
    row_idx = lax.broadcasted_iota(jnp.int32, img.shape, 0)
    ccol = jnp.where(row_idx == 0, 0, ccol)
    for kk in doubling_steps(img.shape[1]):
        crow = crow + shift(crow, 0, kk, 0)
    for kk in doubling_steps(img.shape[0]):
        ccol = ccol + shift(ccol, kk, 0, 0)
    return crow << 2, ccol << 2


def sweep_packed(shift, pk, srow_pk, scol_pk, max_scan: int, big_pk):
    """One Gauss-Seidel sweep on the packed array: each directional
    relaxation is transform -> doubling mins -> untransform -> min.
    Versus the (dist, label) pair form this halves the full-plane op
    count (one array instead of two through every shift/select). Tie
    semantics: equal (sum, length) keys resolve to the SMALLER marker
    label (the pair form kept the nearest); measured corpus impact is
    below the oracle tolerance (perf_history/pectoral_corpus.json)."""
    for axis, s_pk, reverse in ((1, srow_pk, False), (1, srow_pk, True),
                                (0, scol_pk, False), (0, scol_pk, True)):
        t = pk + s_pk if reverse else pk - s_pk
        n = min(pk.shape[axis], max_scan)
        sgn = -1 if reverse else 1
        for k in doubling_steps(n):
            dy, dx = (sgn * k, 0) if axis == 0 else (0, sgn * k)
            t = jnp.minimum(t, shift(t, dy, dx, big_pk))
        cand = t - s_pk if reverse else t + s_pk
        pk = jnp.minimum(pk, cand)
    return pk


def relax_to_fixpoint_packed(shift, img, markers, max_iters: int,
                             max_scan: int,
                             label_values: tuple = ()):
    """Packed-int32 variant of relax_to_fixpoint (same fixpoint metric
    up to float-epsilon rounding and label tie order — see
    sweep_packed). Callers gate with use_packed(shape,
    len(label_values)). label_values are the markers' actual values
    (e.g. the cleaner's 255/128/64), remapped to 1..3 internally and
    back on return; ties prefer the earlier entry."""
    h, w = img.shape
    k, big = _pack_params(h, w)
    big_pk = jnp.int32(big)
    srow_pk, scol_pk = axis_costs_packed(shift, img, k)
    m32 = markers.astype(jnp.int32)
    small = jnp.zeros(markers.shape, jnp.int32)
    for i, v in enumerate(label_values):
        small = jnp.where(m32 == v, np.int32(i + 1), small)
    pk0 = jnp.where(small > 0, small, big_pk)

    def body(state):
        pk, _, it = state
        new = sweep_packed(shift, pk, srow_pk, scol_pk, max_scan, big_pk)
        return new, jnp.any(new != pk), it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    pk, _, _ = lax.while_loop(
        cond, body, (pk0, jnp.bool_(True), jnp.int32(0)))
    small = pk & 3
    labels = jnp.zeros_like(small)
    for i, v in enumerate(label_values):
        labels = jnp.where(small == i + 1, np.int32(v), labels)
    return labels


def label_boundary(shift, labels):
    """cv2.watershed-style ridge (int32 0/1 plane): 4-neighbour label
    disagreements between positive labels, PLUS the 1-px image frame —
    cv2.watershed always marks the whole outer border -1 (verified
    directly; the reference's red boundary paint and border-zeroed
    breast_only_mask both include it, customImageCleaner.py:145-149)."""
    h, w = labels.shape
    boundary = jnp.zeros(labels.shape, jnp.int32)
    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        nl = shift(labels, dy, dx, 0)
        boundary = boundary | (
            (nl > 0) & (labels > 0) & (nl != labels)).astype(jnp.int32)
    r = lax.broadcasted_iota(jnp.int32, labels.shape, 0)
    c = lax.broadcasted_iota(jnp.int32, labels.shape, 1)
    frame = (r == 0) | (r == h - 1) | (c == 0) | (c == w - 1)
    return boundary | frame.astype(jnp.int32)
