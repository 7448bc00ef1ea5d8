"""Connected components / flood-fill on TPU via label propagation.

cv2.connectedComponentsWithStats + floodFill (reference
customImageCleaner.py:60-82) are irregular pointer-chasing algorithms on
CPU. The TPU-native formulation: every foreground pixel starts labeled
with its own linear index and labels relax to the component minimum via

- segmented min-scans along rows and columns (associative_scan, so a
  label crosses an entire row/col run in one pass), plus
- a 3x3 window min for diagonal (8-connectivity) hops,

iterated inside a lax.while_loop until a fixed point. Convergence takes
O(component "turns"), not O(diameter) — a handful of sweeps for real
masks. Everything is static-shape and jit/vmap-safe.
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
    """Running min within contiguous non-barrier runs along `axis`."""

    def op(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf, bv, jnp.minimum(av, bv)), af | bf

    out, _ = lax.associative_scan(op, (vals, barriers), axis=axis, reverse=reverse)
    return out


def _sweep(labels: jax.Array, mask: jax.Array, connectivity: int) -> jax.Array:
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


@functools.partial(jax.jit, static_argnames=("connectivity", "max_iters"))
def label_components(mask: jax.Array, connectivity: int = 8,
                     max_iters: int = 128) -> jax.Array:
    """Label connected True-regions of a (H, W) bool mask.

    Returns int32 (H, W): foreground pixels share their component's
    minimum linear index; background pixels hold a sentinel >= H*W.
    """
    h, w = mask.shape
    mask = mask.astype(bool)
    init = (jnp.arange(h * w, dtype=jnp.int32).reshape(h, w))
    init = jnp.where(mask, init, _INF)

    def cond(state):
        labels, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        labels, _, it = state
        new = _sweep(labels, mask, connectivity)
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = lax.while_loop(cond, body, (init, jnp.bool_(True), 0))
    return labels


def component_areas(labels: jax.Array, mask: jax.Array) -> jax.Array:
    """Pixel count per component, indexed by the component's root label."""
    h, w = labels.shape
    n = h * w
    flat = jnp.where(mask.reshape(-1), labels.reshape(-1), n).astype(jnp.int32)
    return jnp.zeros((n + 1,), jnp.int32).at[flat].add(1)[:n]


@functools.partial(jax.jit, static_argnames=("connectivity", "max_iters"))
def largest_component(mask: jax.Array, connectivity: int = 8,
                      max_iters: int = 128) -> jax.Array:
    """Bool mask of the largest connected foreground object.

    Mirrors select_largest_obj's connectedComponentsWithStats + argmax
    area over non-background labels (customImageCleaner.py:62-66).
    """
    mask = mask.astype(bool)
    labels = label_components(mask, connectivity, max_iters)
    areas = component_areas(labels, mask)
    best = jnp.argmax(areas)
    return mask & (labels == best)


@functools.partial(jax.jit, static_argnames=("max_iters",))
def fill_holes(mask: jax.Array, max_iters: int = 128) -> jax.Array:
    """Fill background regions not connected to the image border.

    Equivalent to the reference's floodFill-from-background +
    bitwise_not trick (customImageCleaner.py:69-76): label the inverse
    mask 4-connectivity (floodFill default), keep inverse-components that
    touch the border as true background, everything else becomes filled.
    """
    mask = mask.astype(bool)
    inv = ~mask
    labels = label_components(inv, connectivity=4, max_iters=max_iters)
    h, w = mask.shape
    n = h * w
    border = jnp.zeros((h, w), bool).at[0, :].set(True).at[-1, :].set(True)
    border = border.at[:, 0].set(True).at[:, -1].set(True)
    border_lab = jnp.where(border & inv, labels, n).reshape(-1)
    is_bg_label = jnp.zeros((n + 1,), bool).at[border_lab].set(True)
    reaches_border = is_bg_label[jnp.clip(labels, 0, n)]
    holes = inv & ~reaches_border
    return mask | holes
