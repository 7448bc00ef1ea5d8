"""Pytree utilities shared across the framework.

Includes the reference's per-tensor gradient-norm clipping semantics
(reference: Classes/CNNModel.py:217-222 clips each gradient array
independently by its own L2 norm, max_norm=5.0, with a 1e-6 fudge in the
denominator).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def clip_tensor_by_norm(g: jax.Array, max_norm: float = 5.0) -> jax.Array:
    """Clip one tensor by its own L2 norm (reference `_clip_grad` semantics).

    ``g * (max_norm / (norm + 1e-6))`` iff ``norm > max_norm``, else ``g``.
    """
    norm = jnp.linalg.norm(g.astype(jnp.float32))
    scale = jnp.where(norm > max_norm, max_norm / (norm + 1e-6), 1.0)
    return (g * scale).astype(g.dtype)


def clip_grads_per_leaf(grads, max_norm: float = 5.0):
    """Apply per-tensor norm clipping to every leaf of a gradient pytree."""
    return jax.tree_util.tree_map(lambda g: clip_tensor_by_norm(g, max_norm), grads)


def tree_size(tree) -> int:
    """Total number of scalar parameters in a pytree."""
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))


def tree_cast(tree, dtype):
    return jax.tree_util.tree_map(lambda x: x.astype(dtype), tree)
