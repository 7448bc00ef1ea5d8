"""Jit-compiled training/eval steps and the epoch-loop trainer.

The reference trains one sample at a time in Python (91.5h for 20 epochs
on 245 images, training_summary_basic.json:82). Here each minibatch
update is a single XLA program: batched forward, batch-averaged grads
(analytically equal to the reference's accumulate-then-average), per-
tensor clip, SGD — and the whole epoch loop only touches the host for
shuffling and logging. Steps are pure functions of (params, batch) so
the data-parallel wrapper in cadx_tpu.parallel can shard the batch axis
over a mesh without changes here.

Reference loop semantics mirrored (Classes/CNNModel.py:399-513):
per-epoch shuffle, minibatch updates, lr x0.98 per epoch, best-weights
snapshot on improved val accuracy and restore at the end. History rows
{epoch, loss, val_acc} match training_History_advanced.json.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cadx_tpu.models import cnn
from cadx_tpu.train import optim


def masked_loss_fn(params, x, y_onehot, mask, config, *, training, rng,
                   compute_dtype=None):
    """Cross-entropy averaged over real (mask=1) samples only.

    Padding the final partial batch to a static shape keeps XLA from
    recompiling; masking reproduces the reference's average over the
    actual sample count (Classes/CNNModel.py:459-464).
    compute_dtype: opt-in bf16 conv compute (cnn.conv_stack) — the
    training fast path; defaults keep the f32-faithful parity contract.
    """
    logits = cnn.apply(params, x, config, training=training, rng=rng,
                       compute_dtype=compute_dtype)
    logp = jax.nn.log_softmax(logits, axis=-1)
    per_sample = -jnp.sum(y_onehot * logp, axis=-1)
    return jnp.sum(per_sample * mask) / jnp.maximum(jnp.sum(mask), 1.0)


@functools.partial(jax.jit,
                   static_argnames=("config", "training", "compute_dtype"),
                   donate_argnums=(0,))
def sgd_train_step(params, x, y_onehot, mask, lr, rng, config, training=True,
                   compute_dtype=None):
    """One basic-pipeline update: grads -> per-tensor clip(5.0) -> SGD.

    `params` is DONATED on TPU (halves peak parameter memory): rebind the
    result and do not reuse the input pytree after the call.
    """
    loss, grads = jax.value_and_grad(masked_loss_fn)(
        params, x, y_onehot, mask, config, training=training, rng=rng,
        compute_dtype=compute_dtype,
    )
    params = optim.sgd_reference_update(params, grads, lr)
    return params, loss


def make_adam_train_step(config: cnn.CNNConfig, tx: optax.GradientTransformation,
                         compute_dtype=None):
    """Advanced-pipeline update: Adam on softmax cross-entropy logits."""

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, x, y_onehot, mask, rng):
        loss, grads = jax.value_and_grad(masked_loss_fn)(
            params, x, y_onehot, mask, config, training=True, rng=rng,
            compute_dtype=compute_dtype,
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


@functools.partial(jax.jit, static_argnames=("config",))
def eval_step(params, x, config):
    """Batched predicted classes (argmax of guarded softmax)."""
    return jnp.argmax(cnn.apply(params, x, config, training=False), axis=-1)


def evaluate(params, X, y_labels, config, batch_size: int = 64) -> float:
    """Test-set accuracy, batched with padding to a static shape."""
    X = np.asarray(X, dtype=np.float32)
    y_labels = np.asarray(y_labels)
    n = len(X)
    preds = predict_classes(params, X, config, batch_size)
    return float(np.mean(preds == y_labels[:n]))


def predict_classes(params, X, config, batch_size: int = 64) -> np.ndarray:
    X = np.asarray(X, dtype=np.float32)
    n = len(X)
    out = []
    for i in range(0, n, batch_size):
        xb = X[i : i + batch_size]
        pad = batch_size - len(xb)
        if pad:
            xb = np.concatenate([xb, np.zeros((pad,) + xb.shape[1:], xb.dtype)])
        p = eval_step(params, jnp.asarray(xb), config)
        out.append(np.asarray(p)[: batch_size - pad])
    return np.concatenate(out) if out else np.zeros((0,), np.int64)


def weight_stats(params) -> list[str]:
    """Per-layer weight statistics lines (reference weight_stats,
    Classes/CNNModel.py:479-487)."""
    lines = []
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    for path, leaf in flat:
        name = jax.tree_util.keystr(path)
        if "kernel" not in name:
            continue
        w = np.asarray(leaf)
        lines.append(
            f"Layer {name}: mean={w.mean():.4e}, std={w.std():.4e}, "
            f"max={w.max():.4e}, min={w.min():.4e}")
    return lines


def grad_stats(grads) -> list[str]:
    """Gradient statistics lines (reference log_gradients,
    Classes/CNNModel.py:516-520)."""
    lines = []
    flat, _ = jax.tree_util.tree_flatten_with_path(grads)
    for path, leaf in flat:
        g = np.asarray(leaf)
        lines.append(
            f"{jax.tree_util.keystr(path)}: mean={g.mean():.2e}, "
            f"std={g.std():.2e}, min={g.min():.2e}, max={g.max():.2e}")
    return lines


@dataclasses.dataclass
class FitResult:
    params: Any
    history: list[dict]          # [{epoch, loss, val_acc}] reference schema
    best_val_acc: float
    epoch_accuracy: list[float]  # reference CNNModel.epoch_accuracy
    train_seconds: float


def fit(
    params,
    config: cnn.CNNConfig,
    X, y_onehot, X_test, y_test_labels,
    *,
    epochs: int = 10,
    lr: float = 0.01,
    batch_size: int = 8,
    optimizer: str = "sgd",            # "sgd" (basic) | "adam" (advanced)
    lr_decay: float = 0.98,
    seed: int = 0,
    restore_best: bool = True,
    log_fn: Callable[[str], None] | None = None,
    checkpoint_path: str | None = None,
    state_path: str | None = None,     # full train-state checkpoint (resume)
    resume: bool = False,
    eval_every_batch: bool = False,    # reference evaluates test set per batch
    log_weight_stats: bool = False,    # reference per-layer stats per epoch
    device_data: bool | None = None,   # keep the dataset device-resident
    device_data_dtype=None,            # e.g. jnp.bfloat16: compressed device
                                       # storage (compute stays f32)
    compute_dtype=None,                # e.g. jnp.bfloat16: bf16 conv MXU
                                       # compute, f32 accumulate/params
                                       # (opt-in fast path; default keeps
                                       # the f32-faithful parity contract)
    update_fn=None,                    # override: (params, opt_state, xb, yb, mb, lr, rng) -> (params, opt_state, loss)
) -> FitResult:
    """Train with the reference loop semantics, one XLA program per batch.

    update_fn lets the data-parallel wrapper substitute a mesh-sharded
    step without duplicating the loop. NOTE: compute_dtype only reaches
    the built-in sgd/adam steps — an update_fn must bake its own (the dp
    makers take a compute_dtype kwarg). With state_path set, a full
    training state (params + optimizer state + epoch + history + rng) is
    checkpointed atomically after every epoch; resume=True continues from
    it — capabilities the reference lacks entirely (SURVEY.md section 5,
    checkpoint/resume row: best-weights-only, no optimizer state, no step).
    """
    X = np.asarray(X, dtype=np.float32)
    y_onehot = np.asarray(y_onehot, dtype=np.float32)
    # the jitted steps DONATE their params argument on TPU; copy once so
    # the caller's pytree stays valid after fit() returns or raises
    # (jnp.asarray is a no-op on JAX arrays — a real copy is required)
    params = jax.tree_util.tree_map(
        lambda a: jnp.array(a, copy=True), params)
    n = len(X)
    host_rng = np.random.default_rng(seed)
    dropout_key = jax.random.key(seed)
    log = log_fn or (lambda s: None)

    # Device-resident data: transfer the dataset once and gather batches
    # on device. Per-batch host->device copies dominate wall time on
    # remote/tunneled runtimes (e.g. the advanced config moves 536MB per
    # batch otherwise). Auto-on below 4GB.
    if device_data is None:
        device_data = X.nbytes + y_onehot.nbytes < 4 * 1024**3
    if device_data:
        store_dtype = device_data_dtype or jnp.float32
        X_dev = jax.device_put(X.astype(store_dtype))
        y_dev = jax.device_put(y_onehot)

        @jax.jit
        def gather_batch(xd, yd, idx):
            xb = jnp.take(xd, idx, axis=0).astype(jnp.float32)
            return xb, jnp.take(yd, idx, axis=0)

    # test set: transfer once, evaluate from device every epoch
    Xte_np = np.asarray(X_test, dtype=np.float32)
    yte_np = np.asarray(y_test_labels)
    eval_bs = min(64, max(len(Xte_np), 1))
    eval_batches = []
    for i in range(0, len(Xte_np), eval_bs):
        xb = Xte_np[i : i + eval_bs]
        padb = eval_bs - len(xb)
        if padb:
            xb = np.concatenate([xb, np.zeros((padb,) + xb.shape[1:], xb.dtype)])
        eval_batches.append((jax.device_put(jnp.asarray(xb)), eval_bs - padb))

    def eval_acc(p) -> float:
        preds = []
        for xb, valid in eval_batches:
            preds.append(np.asarray(eval_step(p, xb, config))[:valid])
        if not preds:
            return 0.0
        return float(np.mean(np.concatenate(preds) == yte_np))

    tx = optim.adam(lr) if optimizer == "adam" else None
    opt_state = tx.init(params) if tx is not None else None
    adam_step = (make_adam_train_step(config, tx, compute_dtype)
                 if tx is not None else None)

    best_acc, best_params = 0.0, None
    history: list[dict] = []
    epoch_accuracy: list[float] = []
    cur_lr = lr
    start_epoch = 0
    t0 = time.time()

    if resume and state_path:
        import os

        from cadx_tpu import checkpoint as ckpt_mod

        if os.path.exists(state_path):
            st = ckpt_mod.load_train_state(state_path)
            params = jax.tree_util.tree_map(jnp.asarray, st["params"])
            if st.get("opt_state") is not None and opt_state is not None:
                opt_state = jax.tree_util.tree_map(jnp.asarray, st["opt_state"])
            best_acc = st["best_acc"]
            best_params = st["best_params"]
            history = list(st["history"])
            epoch_accuracy = list(st["epoch_accuracy"])
            cur_lr = st["lr"]
            start_epoch = st["epoch"]
            host_rng = np.random.default_rng()
            host_rng.bit_generator.state = st["host_rng_state"]
            dropout_key = ckpt_mod.restore_key(st["dropout_key"])
            log(f"[RESUME] from {state_path} at epoch {start_epoch}")

    for epoch in range(start_epoch, epochs):
        perm = host_rng.permutation(n)
        if not device_data:
            Xs, ys = X[perm], y_onehot[perm]
        batch_losses: list = []
        batch_weights: list[float] = []
        for i in range(0, n, batch_size):
            nb = min(batch_size, n - i)
            pad = batch_size - nb
            if device_data:
                idx = np.zeros((batch_size,), np.int32)
                idx[:nb] = perm[i : i + nb]
                xb, yb = gather_batch(X_dev, y_dev, jnp.asarray(idx))
            else:
                xb, yb = Xs[i : i + batch_size], ys[i : i + batch_size]
                if pad:
                    xb = np.concatenate([xb, np.zeros((pad,) + xb.shape[1:], xb.dtype)])
                    yb = np.concatenate([yb, np.zeros((pad,) + yb.shape[1:], yb.dtype)])
                xb, yb = jnp.asarray(xb), jnp.asarray(yb)
            mb = np.zeros((batch_size,), np.float32)
            mb[:nb] = 1.0
            dropout_key, sub = jax.random.split(dropout_key)
            if update_fn is not None:
                params, opt_state, loss = update_fn(
                    params, opt_state, xb, yb,
                    jnp.asarray(mb), jnp.float32(cur_lr), sub,
                )
            elif tx is not None:
                params, opt_state, loss = adam_step(
                    params, opt_state, xb, yb, jnp.asarray(mb), sub,
                )
            else:
                params, loss = sgd_train_step(
                    params, xb, yb, jnp.asarray(mb),
                    jnp.float32(cur_lr), sub, config,
                    compute_dtype=compute_dtype,
                )
            # keep losses on device; one fetch per epoch (host round trips
            # cost ~30ms each on tunneled runtimes)
            batch_losses.append(loss)
            batch_weights.append(float(nb))
            if eval_every_batch:
                # reference: full test-set eval after every batch
                # (CNNM.py:537 — a major reason its training was slow;
                # off by default here)
                acc = eval_acc(params)
                log(f"[EPOCH {epoch+1}/{epochs}, BATCH {i//batch_size+1}] "
                    f"BatchLoss={float(loss):.4f}  Accuracy={acc:.4f}")

        avg_loss = float(
            jnp.stack(batch_losses) @ jnp.asarray(batch_weights, jnp.float32)
        ) / n
        val_acc = eval_acc(params)
        epoch_accuracy.append(val_acc)
        history.append({"epoch": epoch + 1, "loss": avg_loss, "val_acc": val_acc})
        log(f"[EPOCH {epoch+1}/{epochs}] Loss={avg_loss:.4f}, ValAcc={val_acc:.4f}")
        if log_weight_stats:
            log("[Weight Stats] per layer:")
            for line in weight_stats(params):
                log("    " + line)

        if val_acc > best_acc:
            best_acc = val_acc
            # device-side copy: a host snapshot would D2H the full
            # parameter set every improving epoch (brutal on tunneled
            # runtimes); only state_path checkpointing pays that cost
            best_params = jax.tree_util.tree_map(jnp.array, params)
            if checkpoint_path:
                from cadx_tpu import checkpoint as ckpt

                ckpt.save_npz(params, config, checkpoint_path)
        if optimizer == "sgd":
            cur_lr *= lr_decay

        if state_path:
            from cadx_tpu import checkpoint as ckpt_mod

            ckpt_mod.save_train_state(state_path, {
                "params": params,
                "opt_state": opt_state,
                "best_acc": best_acc,
                "best_params": best_params,
                "history": history,
                "epoch_accuracy": epoch_accuracy,
                "lr": cur_lr,
                "epoch": epoch + 1,
                "host_rng_state": host_rng.bit_generator.state,
                "dropout_key": dropout_key,
            })

    if restore_best and best_params is not None:
        params = jax.tree_util.tree_map(jnp.asarray, best_params)
    return FitResult(
        params=params,
        history=history,
        best_val_acc=best_acc,
        epoch_accuracy=epoch_accuracy,
        train_seconds=time.time() - t0,
    )
