"""Marker-driven watershed as jittable geodesic label relaxation.

cv2.watershed (used for pectoral-muscle/breast separation,
customImageCleaner.py:144) is a priority-queue flooding algorithm —
unjittable as-is. The TPU-native equivalent: each marker floods outward
along minimum-geodesic-cost paths where the edge cost is the intensity
difference (the same quantity that stalls OpenCV's flooding at ridges).

Algorithm: min-plus LINE-SCAN relaxation (Gauss-Seidel over the four
scan directions). Along a row, the best cost reaching pixel i from any
pixel j<=i on that row is min_j (d[j] + s[i] - s[j]) where s is the
prefix sum of inter-pixel edge costs — i.e. a running min of (d - s)
plus s, computed with a log2(n)-step shift-doubling cummin that carries
the argmin's label. One sweep = LR, RL, TB, BT scans, each seeing the
previous scan's updates, so an improvement crosses the whole image in
ONE sweep instead of one pixel per iteration (Jacobi). The loop exits
when a full sweep changes nothing — an EXACT Bellman-Ford fixpoint, so
no label can flip later (the round-1 `stable_iters` label-stability
heuristic could freeze a boundary early on long low-cost corridors;
this replaces it). Convergence takes O(direction changes of optimal
paths) sweeps — 3-6 for real mammograms.

The contract is tolerance-tested (mask IoU vs cv2.watershed) rather than
bitwise: ridge ties may resolve differently, but basin assignments agree.
The Pallas kernel (kernels/watershed_kernel.py) implements the identical
scan arithmetic VMEM-resident and is dispatched for large TPU images;
results are bit-identical between the two paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np

_BIG = np.float32(1e30)

# (dy, dx) 4-neighborhood (boundary extraction)
_SHIFTS = ((1, 0), (-1, 0), (0, 1), (0, -1))


def _shift(x: jax.Array, dy: int, dx: int, fill) -> jax.Array:
    """Shift a 2D array via pad+slice, filling vacated cells."""
    h, w = x.shape
    pad = ((max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0)))
    xp = jnp.pad(x, pad, constant_values=fill)
    return xp[max(-dy, 0) : max(-dy, 0) + h, max(-dx, 0) : max(-dx, 0) + w]


def _doubling_steps(n: int):
    """Shift offsets 1, 2, 4, ... covering a window of >= n."""
    steps, k = [], 1
    while k < n:
        steps.append(k)
        k *= 2
    return tuple(steps)


def _scan_min_carry(w: jax.Array, l: jax.Array, axis: int, reverse: bool,
                    max_scan: int):
    """Running min of w along `axis` (prefix if not reverse, suffix if
    reverse) over a window of up to max_scan, carrying the label of the
    argmin. Strict < keeps the nearest minimiser on ties. A capped
    window (< axis length) only bounds how far an improvement travels
    per sweep — the fixpoint is unchanged and still exact, and real
    pectoral bands converge in the same few sweeps at ~35% fewer rolls."""
    n = min(w.shape[axis], max_scan)
    sgn = 1 if not reverse else -1
    for k in _doubling_steps(n):
        dy, dx = (sgn * k, 0) if axis == 0 else (0, sgn * k)
        w_sh = _shift(w, dy, dx, _BIG)
        l_sh = _shift(l, dy, dx, 0)
        take = w_sh < w
        w = jnp.where(take, w_sh, w)
        l = jnp.where(take, l_sh, l)
    return w, l


def _doubling_cumsum(x: jax.Array, axis: int) -> jax.Array:
    """Inclusive prefix sum via shift-doubling adds — the exact same
    float association order as the Pallas kernel, so both watershed
    paths produce bit-identical prefix sums."""
    for k in _doubling_steps(x.shape[axis]):
        dy, dx = (k, 0) if axis == 0 else (0, k)
        x = x + _shift(x, dy, dx, 0.0)
    return x


def _axis_costs(img: jax.Array):
    """Loop-invariant inter-pixel costs and their prefix sums.

    crow[i, j] = cost of stepping between (i, j-1) and (i, j); the first
    column is 0 so srow = cumsum(crow) satisfies
    srow[i, j] - srow[i, k] = path cost k -> j along row i.
    """
    eps = np.float32(1e-3)
    crow = jnp.abs(img - _shift(img, 0, 1, 0.0)) + eps
    crow = crow.at[:, 0].set(0.0)
    ccol = jnp.abs(img - _shift(img, 1, 0, 0.0)) + eps
    ccol = ccol.at[0, :].set(0.0)
    return _doubling_cumsum(crow, axis=1), _doubling_cumsum(ccol, axis=0)


def _sweep(d, l, srow, scol, max_scan: int):
    """One Gauss-Seidel sweep: LR, RL, TB, BT line relaxations."""
    # left-to-right: d'[i] = min(d[i], min_{j<i}(d[j] - s[j]) + s[i])
    w, lw = _scan_min_carry(d - srow, l, 1, False, max_scan)
    cand = w + srow
    take = cand < d
    d, l = jnp.where(take, cand, d), jnp.where(take, lw, l)
    # right-to-left: d'[i] = min(d[i], min_{j>i}(d[j] + s[j]) - s[i])
    w, lw = _scan_min_carry(d + srow, l, 1, True, max_scan)
    cand = w - srow
    take = cand < d
    d, l = jnp.where(take, cand, d), jnp.where(take, lw, l)
    # top-to-bottom / bottom-to-top
    w, lw = _scan_min_carry(d - scol, l, 0, False, max_scan)
    cand = w + scol
    take = cand < d
    d, l = jnp.where(take, cand, d), jnp.where(take, lw, l)
    w, lw = _scan_min_carry(d + scol, l, 0, True, max_scan)
    cand = w - scol
    take = cand < d
    d, l = jnp.where(take, cand, d), jnp.where(take, lw, l)
    return d, l


@functools.partial(jax.jit, static_argnames=("max_iters", "max_scan"))
def marker_watershed(image: jax.Array, markers: jax.Array,
                     max_iters: int = 256, max_scan: int = 256):
    """Flood `markers` (>0 labels; 0 = unlabeled) over `image`.

    Returns (labels, boundary) where boundary marks pixels adjacent to a
    different label (cv2.watershed's -1 ridge pixels). Runs scan sweeps
    to the exact geodesic fixpoint (bounded by `max_iters` sweeps).
    """
    h, w = image.shape
    from cadx_tpu.ops.components import _use_pallas

    if _use_pallas(h, w):
        from cadx_tpu.kernels.watershed_kernel import marker_watershed_pallas

        labels, boundary = marker_watershed_pallas(
            image[None], markers[None], max_iters, max_scan)
        return labels[0], boundary[0]

    img = image.astype(jnp.float32)
    labels0 = markers.astype(jnp.int32)
    dist0 = jnp.where(labels0 > 0, 0.0, _BIG)
    srow, scol = _axis_costs(img)

    def body(state):
        labels, dist, _, it = state
        new_d, new_l = _sweep(dist, labels, srow, scol, max_scan)
        changed = jnp.any(new_d != dist)
        return new_l, new_d, changed, it + 1

    def cond(state):
        _, _, changed, it = state
        return changed & (it < max_iters)

    labels, dist, _, _ = lax.while_loop(
        cond, body, (labels0, dist0, jnp.bool_(True), 0)
    )

    boundary = jnp.zeros(labels.shape, bool)
    for dy, dx in _SHIFTS:
        nl = _shift(labels, dy, dx, 0)
        boundary |= (nl > 0) & (labels > 0) & (nl != labels)
    return labels, boundary
