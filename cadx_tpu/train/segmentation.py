"""U-Net segmentation training (BASELINE.json config: "U-Net ROI
segmentation (encoder-decoder + skip connections)").

The reference never trains its U-Nets (the Keras one is an MSE
autoencoder sketch, the smp one is pretrained); this trainer makes
segmentation a first-class capability: jitted Adam steps on Dice+BCE,
batched, optionally data-parallel over the mesh, with IoU/Dice metrics.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cadx_tpu.models import unet


def dice_bce_loss(params, x, y, config: unet.UNetConfig,
                  bce_weight: float = 0.5, eps: float = 1e-6) -> jax.Array:
    """Standard segmentation loss: weighted BCE + soft Dice."""
    p = jnp.clip(unet.unet_apply(params, x, config), eps, 1 - eps)
    bce = -jnp.mean(y * jnp.log(p) + (1 - y) * jnp.log(1 - p))
    inter = jnp.sum(p * y, axis=(1, 2, 3))
    denom = jnp.sum(p, axis=(1, 2, 3)) + jnp.sum(y, axis=(1, 2, 3))
    dice = 1.0 - jnp.mean((2 * inter + eps) / (denom + eps))
    return bce_weight * bce + (1 - bce_weight) * dice


def iou_dice(pred_mask: jax.Array, true_mask: jax.Array, eps: float = 1e-6):
    """Per-batch mean IoU and Dice of thresholded predictions."""
    p = pred_mask.astype(jnp.float32)
    t = true_mask.astype(jnp.float32)
    inter = jnp.sum(p * t, axis=(1, 2, 3))
    union = jnp.sum(jnp.maximum(p, t), axis=(1, 2, 3))
    denom = jnp.sum(p, axis=(1, 2, 3)) + jnp.sum(t, axis=(1, 2, 3))
    return (jnp.mean((inter + eps) / (union + eps)),
            jnp.mean((2 * inter + eps) / (denom + eps)))


@dataclasses.dataclass
class SegFitResult:
    params: dict
    history: list[dict]   # {epoch, loss, val_iou, val_dice}


def fit_segmentation(
    params, config: unet.UNetConfig, X, Y, X_val, Y_val, *,
    epochs: int = 10, lr: float = 1e-3, batch_size: int = 8,
    threshold: float = 0.5, seed: int = 0,
    log_fn: Callable[[str], None] | None = None, mesh=None,
) -> SegFitResult:
    """Train a UNet on (X (N,H,W,C) in [0,1], Y (N,H,W,1) binary masks)."""
    log = log_fn or (lambda s: None)
    X = np.asarray(X, np.float32)
    Y = np.asarray(Y, np.float32)
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    def _step(params, opt_state, xb, yb):
        loss, grads = jax.value_and_grad(dice_bce_loss)(params, xb, yb, config)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        ds = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        step_fn = jax.jit(_step, in_shardings=(repl, repl, ds, ds),
                          out_shardings=(repl, repl, None))
    else:
        step_fn = jax.jit(_step)

    @jax.jit
    def val_metrics(params, xv, yv):
        pred = unet.unet_apply(params, xv, config) >= threshold
        return iou_dice(pred, yv)

    rng = np.random.default_rng(seed)
    n = len(X)
    batch_size = min(batch_size, n)  # small datasets still train
    xv = jnp.asarray(X_val)
    yv = jnp.asarray(Y_val)
    history = []
    for epoch in range(epochs):
        perm = rng.permutation(n)
        losses, weights = [], []
        for i in range(0, n, batch_size):
            idx = perm[i : i + batch_size]
            if len(idx) < batch_size:  # wrap the tail to keep shapes static
                idx = np.concatenate([idx, perm[: batch_size - len(idx)]])
            params, opt_state, loss = step_fn(
                params, opt_state, jnp.asarray(X[idx]), jnp.asarray(Y[idx]))
            losses.append(loss)              # device scalars; fetch once/epoch
            weights.append(float(len(idx)))
        total = float(jnp.stack(losses) @ jnp.asarray(weights, jnp.float32))
        iou, dice = val_metrics(params, xv, yv)
        row = {"epoch": epoch + 1,
               "loss": total / max(sum(weights), 1.0),
               "val_iou": float(iou), "val_dice": float(dice)}
        history.append(row)
        log(f"[SEG {epoch+1}/{epochs}] loss={row['loss']:.4f} "
            f"iou={row['val_iou']:.3f} dice={row['val_dice']:.3f}")
    return SegFitResult(params=params, history=history)
