"""Optimizers matching the reference training semantics.

Two trainers exist in the reference:
- "basic": plain SGD on batch-averaged grads with per-tensor norm clipping
  at 5.0 and per-epoch lr decay x0.98 (Classes/CNNModel.py:372-394, :504).
- "advanced": Adam(lr=1e-3) + softmax cross-entropy (ADCNNM.py:86-107).

The basic path is expressed as a pure functional update (clip-then-SGD)
so the whole minibatch update jits into one XLA program; Adam reuses
optax.
"""

from __future__ import annotations

import jax
import optax

from cadx_tpu.utils.tree import clip_grads_per_leaf


def sgd_reference_update(params, grads, lr, max_norm: float = 5.0):
    """Reference `_apply_grads`: per-tensor clip at max_norm, then SGD."""
    clipped = clip_grads_per_leaf(grads, max_norm)
    return jax.tree_util.tree_map(lambda p, g: p - lr * g, params, clipped)


def decayed_lr(base_lr: float, epoch, decay: float = 0.98):
    """lr after `epoch` epochs of x`decay` (reference: lr *= 0.98 per epoch)."""
    return base_lr * (decay ** epoch)


def adam(lr: float = 1e-3) -> optax.GradientTransformation:
    """The advanced trainer's optimizer (torch.optim.Adam defaults)."""
    return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
