"""K-fold cross-validation, data-parallel over a TPU mesh.

The reference `CrossValidator` (Classes/CrossValidator.py:10-17) wraps
sklearn KFold(n_splits=5) and leaves `split_data`/`aggregate_metrics`
unimplemented. Here both are implemented: deterministic sklearn-identical
fold splitting, per-fold training through the shared fit() loop (each
fold's minibatch update sharded over the mesh "data" axis when a mesh is
given), and metric aggregation across folds.
"""

from __future__ import annotations

import dataclasses
import jax
import numpy as np

from cadx_tpu.models import cnn
from cadx_tpu.train import step
from cadx_tpu.train.metrics import evaluation_block


class KFold:
    """sklearn-identical deterministic K-fold splitter.

    First n % k folds get n//k + 1 samples; optional shuffle with seed.
    """

    def __init__(self, n_splits: int = 5, shuffle: bool = False, seed: int = 0):
        if n_splits < 2:
            raise ValueError("n_splits must be >= 2")
        self.n_splits = n_splits
        self.shuffle = shuffle
        self.seed = seed

    def split(self, n: int):
        idx = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed).shuffle(idx)
        fold_sizes = np.full(self.n_splits, n // self.n_splits, dtype=int)
        fold_sizes[: n % self.n_splits] += 1
        start = 0
        for size in fold_sizes:
            test = idx[start : start + size]
            train = np.concatenate([idx[:start], idx[start + size :]])
            yield train, test
            start += size


@dataclasses.dataclass
class CrossValResult:
    fold_results: list[step.FitResult]
    fold_accuracies: list[float]
    fold_evaluations: list[dict]
    mean_accuracy: float
    std_accuracy: float

    def aggregate_metrics(self) -> dict:
        return {
            "n_splits": len(self.fold_accuracies),
            "fold_accuracies": self.fold_accuracies,
            "mean_accuracy": self.mean_accuracy,
            "std_accuracy": self.std_accuracy,
        }


def cross_validate(
    config: cnn.CNNConfig,
    X,
    y_labels,
    *,
    n_splits: int = 5,
    epochs: int = 10,
    lr: float = 0.01,
    batch_size: int = 8,
    optimizer: str = "sgd",
    seed: int = 0,
    mesh=None,
    log_fn=None,
    compute_dtype=None,
) -> CrossValResult:
    """Train/evaluate k folds; shard each fold's batches over `mesh`.
    compute_dtype: opt-in bf16 conv compute (see cnn.conv_stack)."""
    X = np.asarray(X, dtype=np.float32)
    y_labels = np.asarray(y_labels)
    y_onehot = np.eye(config.num_classes, dtype=np.float32)[y_labels]

    update_fn = None
    opt_init = None
    if mesh is not None:
        from cadx_tpu.parallel import data_parallel as dp

        if optimizer == "adam":
            update_fn, opt_init = dp.make_dp_adam_update(
                config, mesh, lr, compute_dtype=compute_dtype)
        else:
            update_fn = dp.make_dp_sgd_update(
                config, mesh, compute_dtype=compute_dtype)

    results, accs, evals = [], [], []
    for fold, (train_idx, test_idx) in enumerate(KFold(n_splits).split(len(X))):
        params = cnn.init_params(jax.random.key(seed + fold), config)
        res = step.fit(
            params, config,
            X[train_idx], y_onehot[train_idx],
            X[test_idx], y_labels[test_idx],
            epochs=epochs, lr=lr, batch_size=batch_size,
            optimizer=optimizer, seed=seed + fold,
            log_fn=log_fn, update_fn=update_fn,
            compute_dtype=compute_dtype,
        )
        preds = step.predict_classes(res.params, X[test_idx], config)
        evals.append(evaluation_block(y_labels[test_idx], preds, config.num_classes))
        accs.append(res.best_val_acc)
        results.append(res)
        if log_fn:
            log_fn(f"[FOLD {fold+1}/{n_splits}] best_val_acc={res.best_val_acc:.4f}")

    return CrossValResult(
        fold_results=results,
        fold_accuracies=accs,
        fold_evaluations=evals,
        mean_accuracy=float(np.mean(accs)),
        std_accuracy=float(np.std(accs)),
    )
