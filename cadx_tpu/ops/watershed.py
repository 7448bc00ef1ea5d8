"""Marker-driven watershed as jittable geodesic label relaxation.

cv2.watershed (used for pectoral-muscle/breast separation,
customImageCleaner.py:144) is a priority-queue flooding algorithm —
unjittable as-is. The TPU-native equivalent: each marker floods outward
along minimum-geodesic-cost paths where the edge cost is the intensity
difference (the same quantity that stalls OpenCV's flooding at ridges).
Bellman-Ford-style relaxation over the 4-neighborhood runs as pure
elementwise VPU work inside a lax.while_loop until a fixed point.

The contract is tolerance-tested (mask IoU vs cv2.watershed) rather than
bitwise: ridge ties may resolve differently, but basin assignments agree.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_BIG = jnp.float32(3.4e38)


def _shift(x: jax.Array, dy: int, dx: int, fill) -> jax.Array:
    """Shift a 2D array, filling vacated cells."""
    out = jnp.roll(x, (dy, dx), axis=(0, 1))
    if dy == 1:
        out = out.at[0, :].set(fill)
    elif dy == -1:
        out = out.at[-1, :].set(fill)
    if dx == 1:
        out = out.at[:, 0].set(fill)
    elif dx == -1:
        out = out.at[:, -1].set(fill)
    return out


@functools.partial(jax.jit, static_argnames=("max_iters",))
def marker_watershed(image: jax.Array, markers: jax.Array,
                     max_iters: int = 1024):
    """Flood `markers` (>0 labels; 0 = unlabeled) over `image`.

    Returns (labels, boundary) where boundary marks pixels adjacent to a
    different label (cv2.watershed's -1 ridge pixels).
    """
    img = image.astype(jnp.float32)
    labels0 = markers.astype(jnp.int32)
    dist0 = jnp.where(labels0 > 0, 0.0, _BIG)

    shifts = ((1, 0), (-1, 0), (0, 1), (0, -1))

    def body(state):
        labels, dist, _, it = state
        best_d, best_l = dist, labels
        for dy, dx in shifts:
            nd = _shift(dist, dy, dx, _BIG)
            nl = _shift(labels, dy, dx, 0)
            nimg = _shift(img, dy, dx, 0.0)
            cand = nd + jnp.abs(img - nimg) + 1e-3
            take = (cand < best_d) & (nl > 0)
            best_d = jnp.where(take, cand, best_d)
            best_l = jnp.where(take, nl, best_l)
        changed = jnp.any(best_l != labels) | jnp.any(best_d != dist)
        return best_l, best_d, changed, it + 1

    def cond(state):
        _, _, changed, it = state
        return changed & (it < max_iters)

    labels, dist, _, _ = lax.while_loop(
        cond, body, (labels0, dist0, jnp.bool_(True), 0)
    )

    boundary = jnp.zeros(labels.shape, bool)
    for dy, dx in shifts:
        nl = _shift(labels, dy, dx, 0)
        boundary |= (nl > 0) & (labels > 0) & (nl != labels)
    return labels, boundary
