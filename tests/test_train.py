"""Training subsystem tests: SGD step parity vs oracle, learning on
synthetic data, Adam path, metrics vs sklearn, and JSON schema parity."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadx_tpu.models import cnn
from cadx_tpu.train import metrics, optim, step, summary

from reference_oracle import OracleCNN, make_oracle_weights

CFG = dict(
    input_shape=(12, 12, 2),
    num_classes=2,
    conv_layers=[(4, 3)],
    hidden_units=[16],
    dropout_rate=0.0,
    leaky_alpha=0.01,
)


def _to_jax_params(w):
    return {
        "conv": [
            {"kernel": jnp.asarray(f.transpose(1, 2, 3, 0), jnp.float32),
             "bias": jnp.asarray(b, jnp.float32)}
            for f, b in zip(w["conv_filters"], w["conv_biases"])
        ],
        "dense": [
            {"kernel": jnp.asarray(W.T, jnp.float32), "bias": jnp.asarray(b, jnp.float32)}
            for W, b in zip(w["dense_weights"], w["dense_biases"])
        ],
        "output": {
            "kernel": jnp.asarray(w["output_weights"].T, jnp.float32),
            "bias": jnp.asarray(w["output_biases"], jnp.float32),
        },
    }


def test_sgd_step_matches_oracle(rng):
    """One batch update == reference accumulate/average/clip/SGD."""
    config = cnn.CNNConfig.from_json_dict(CFG)
    weights = make_oracle_weights(rng, CFG)
    oracle = OracleCNN(CFG, weights)
    params = _to_jax_params(weights)

    B = 4
    xb = rng.standard_normal((B,) + CFG["input_shape"]).astype(np.float32)
    labels = rng.integers(0, 2, B)
    yb = np.eye(2)[labels].astype(np.float32)
    lr = 0.05

    # oracle: per-sample grads averaged, then per-tensor clip 5.0, then SGD
    acc = None
    for i in range(B):
        _, cache = oracle.forward(xb[i])
        g, _ = oracle.backward(cache, yb[i])
        if acc is None:
            acc = g
        else:
            for k in acc:
                if isinstance(acc[k], list):
                    acc[k] = [a + b for a, b in zip(acc[k], g[k])]
                else:
                    acc[k] = acc[k] + g[k]
    def clip(a):
        n = np.linalg.norm(a)
        return a * (5.0 / (n + 1e-6)) if n > 5.0 else a
    avg = lambda a: a / B
    exp_out_W = weights["output_weights"] - lr * clip(avg(acc["output_dW"]))
    exp_conv_F = weights["conv_filters"][0] - lr * clip(avg(acc["conv_dF"][0]))
    exp_dense_b = weights["dense_biases"][0] - lr * clip(avg(acc["dense_db"][0]))

    mask = jnp.ones((B,), jnp.float32)
    new_params, loss = step.sgd_train_step(
        params, jnp.asarray(xb), jnp.asarray(yb), mask, jnp.float32(lr),
        jax.random.key(0), config, training=False,
    )
    np.testing.assert_allclose(np.asarray(new_params["output"]["kernel"]).T,
                               exp_out_W, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_params["conv"][0]["kernel"]).transpose(3, 0, 1, 2),
        exp_conv_F, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_params["dense"][0]["bias"]),
                               exp_dense_b, atol=1e-5)
    assert np.isfinite(float(loss))


def _synthetic_dataset(rng, n=64, shape=(12, 12, 2)):
    """Two linearly separable blob classes in image space."""
    y = rng.integers(0, 2, n)
    X = rng.standard_normal((n,) + shape).astype(np.float32) * 0.1
    X[y == 1, 3:7, 3:7, :] += 2.0  # bright square = class 1
    return X, y


def test_fit_sgd_learns(rng):
    config = cnn.CNNConfig.from_json_dict(CFG)
    params = cnn.init_params(jax.random.key(0), config)
    X, y = _synthetic_dataset(rng)
    Xt, yt = _synthetic_dataset(rng, n=32)
    res = step.fit(
        params, config, X, np.eye(2)[y], Xt, yt,
        epochs=8, lr=0.05, batch_size=16, optimizer="sgd", seed=0,
    )
    assert res.best_val_acc >= 0.9, res.history
    assert len(res.history) == 8
    assert set(res.history[0]) == {"epoch", "loss", "val_acc"}
    # restore_best means final params reproduce best accuracy
    assert step.evaluate(res.params, Xt, yt, config) == pytest.approx(res.best_val_acc)


def test_fit_adam_learns(rng):
    config = cnn.CNNConfig.from_json_dict(dict(CFG, dropout_rate=0.1))
    params = cnn.init_params(jax.random.key(1), config)
    X, y = _synthetic_dataset(rng)
    Xt, yt = _synthetic_dataset(rng, n=32)
    res = step.fit(
        params, config, X, np.eye(2)[y], Xt, yt,
        epochs=12, lr=3e-3, batch_size=16, optimizer="adam", seed=0,
    )
    assert res.best_val_acc >= 0.8, res.history
    assert res.history[-1]["loss"] < 0.5 * res.history[0]["loss"]


def test_partial_batch_masking(rng):
    """n not divisible by batch_size must not poison the update."""
    config = cnn.CNNConfig.from_json_dict(CFG)
    params = cnn.init_params(jax.random.key(0), config)
    X, y = _synthetic_dataset(rng, n=19)
    res = step.fit(params, config, X, np.eye(2)[y], X, y,
                   epochs=1, lr=0.01, batch_size=8)
    assert np.isfinite(res.history[0]["loss"])


def test_metrics_match_sklearn(rng):
    from sklearn.metrics import classification_report as sk_report
    from sklearn.metrics import confusion_matrix as sk_cm

    y_true = rng.integers(0, 3, 100)
    y_pred = rng.integers(0, 3, 100)
    cm = np.asarray(metrics.confusion_matrix(jnp.asarray(y_true), jnp.asarray(y_pred), 3))
    np.testing.assert_array_equal(cm, sk_cm(y_true, y_pred))

    ours = metrics.classification_report(y_true, y_pred, 3)
    ref = sk_report(y_true, y_pred, output_dict=True)
    for cls in ["0", "1", "2", "macro avg", "weighted avg"]:
        for k in ["precision", "recall", "f1-score"]:
            assert ours[cls][k] == pytest.approx(ref[cls][k], abs=1e-6)
        assert ours[cls]["support"] == ref[cls]["support"]
    assert ours["accuracy"] == pytest.approx(ref["accuracy"], abs=1e-6)


def test_summary_schema(tmp_path, rng):
    config = cnn.CNNConfig.from_json_dict(CFG)
    y_true = rng.integers(0, 2, 25)
    y_pred = rng.integers(0, 2, 25)
    s = summary.build_summary(
        config=config, num_samples=245, train_split=220, test_split=25,
        epochs=60, batch_size=32, learning_rate=0.001, device="tpu",
        best_val_acc=0.76, y_true=y_true, y_pred=y_pred,
        label_encoder={"BENIGN": 0, "MALIGNANT": 1}, train_seconds=981,
    )
    # exact top-level schema of the reference summary JSON
    assert list(s) == ["dataset", "model", "training", "evaluation",
                       "label_encoder", "Training Time"]
    assert s["Training Time"] == "00:16:21"
    assert set(s["evaluation"]) == {"test_accuracy", "confusion_matrix",
                                    "classification_report"}
    p = str(tmp_path / "training_summary_test.json")
    summary.write_summary(s, p)
    loaded = summary.load_summary(p)
    assert loaded == json.loads(json.dumps(s))
    cfg2 = summary.config_from_summary(loaded)
    assert cfg2.conv_layers == config.conv_layers

    hist = [{"epoch": 1, "loss": 2.2, "val_acc": 0.4}]
    hp = str(tmp_path / "training_History_test.json")
    summary.write_history(hist, hp)
    assert summary.load_history(hp) == hist
    # nested-once layout like the reference file
    with open(hp) as f:
        assert json.load(f) == [hist]


def test_fit_bf16_compute_learns_and_tracks_f32(rng):
    """Opt-in bf16 conv compute (fit(compute_dtype=jnp.bfloat16)): the
    model still learns, and one update step stays within bf16 tolerance
    of the f32 step (params f32, accumulation f32, convs bf16)."""
    import jax
    import jax.numpy as jnp

    from cadx_tpu.models import cnn
    from cadx_tpu.train import step as ts

    config = cnn.CNNConfig(input_shape=(12, 12, 3), num_classes=2,
                           conv_layers=((6, 3),), hidden_units=(16,),
                           dropout_rate=0.0)
    n = 24
    X = rng.standard_normal((n, 12, 12, 3)).astype(np.float32)
    y = (X.mean(axis=(1, 2, 3)) > 0).astype(int)
    y1h = np.eye(2)[y].astype(np.float32)

    p0 = cnn.init_params(jax.random.key(0), config)
    pf = jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True), p0)
    pb = jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True), p0)
    xb, yb = jnp.asarray(X[:8]), jnp.asarray(y1h[:8])
    mb = jnp.ones((8,), jnp.float32)
    k = jax.random.key(1)
    pf, loss_f = ts.sgd_train_step(pf, xb, yb, mb, jnp.float32(0.05), k,
                                   config)
    pb, loss_b = ts.sgd_train_step(pb, xb, yb, mb, jnp.float32(0.05), k,
                                   config, compute_dtype=jnp.bfloat16)
    assert abs(float(loss_f) - float(loss_b)) < 0.05
    for lf, lb in zip(jax.tree_util.tree_leaves(pf),
                      jax.tree_util.tree_leaves(pb)):
        assert lb.dtype == lf.dtype == jnp.float32  # params stay f32
        np.testing.assert_allclose(np.asarray(lf), np.asarray(lb),
                                   atol=2e-2)

    res = ts.fit(p0, config, X, y1h, X[:8], y[:8], epochs=8, lr=0.05,
                 batch_size=8, optimizer="adam", seed=0,
                 compute_dtype=jnp.bfloat16)
    assert res.history[-1]["loss"] < res.history[0]["loss"]
    assert max(res.epoch_accuracy) >= 0.5
