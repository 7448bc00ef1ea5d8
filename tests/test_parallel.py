"""Mesh / data-parallel / cross-validation tests on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import jax as _jax

# these tests shard over an 8-device mesh (virtual CPU in CI); on the
# single real TPU (CADX_TEST_TPU=1) they cannot run
pytestmark = pytest.mark.skipif(
    _jax.device_count() < 8, reason="needs an 8-device mesh")

from cadx_tpu.models import cnn
from cadx_tpu.parallel import data_parallel as dp
from cadx_tpu.parallel import mesh as meshlib
from cadx_tpu.train import crossval, step

CFG = cnn.CNNConfig(
    input_shape=(12, 12, 2),
    num_classes=2,
    conv_layers=((4, 3),),
    hidden_units=(16,),
    dropout_rate=0.0,
)


def _data(rng, n=64):
    y = rng.integers(0, 2, n)
    X = rng.standard_normal((n, 12, 12, 2)).astype(np.float32) * 0.1
    X[y == 1, 3:7, 3:7, :] += 2.0
    return X, y


def test_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest should force 8 virtual CPU devices"
    m = meshlib.make_mesh()
    assert m.shape == {"data": 8, "model": 1}
    m2 = meshlib.make_mesh(n_data=4, n_model=2)
    assert m2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        meshlib.make_mesh(n_data=16)


def test_dp_sgd_matches_single_device(rng):
    """Mesh-sharded update must produce the same params as single-device."""
    mesh = meshlib.make_mesh()
    params = cnn.init_params(jax.random.key(0), CFG)
    X, y = _data(rng, 16)
    yb = np.eye(2)[y].astype(np.float32)
    mask = jnp.ones((16,), jnp.float32)
    lr = jnp.float32(0.05)
    key = jax.random.key(1)

    # sgd_train_step donates its params arg — pass copies to keep `params`
    single, _ = step.sgd_train_step(
        jax.tree_util.tree_map(jnp.array, params),
        jnp.asarray(X), jnp.asarray(yb), mask, lr, key, CFG, training=False
    )
    # dropout_rate=0 so rng path identical; training=True==False here
    update = dp.make_dp_sgd_update(CFG, mesh)
    sharded, _, _ = update(
        jax.tree_util.tree_map(jnp.array, params), None,
        jnp.asarray(X), jnp.asarray(yb), mask, lr, key,
    )
    for a, b in zip(jax.tree_util.tree_leaves(single), jax.tree_util.tree_leaves(sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dp_fit_learns(rng):
    mesh = meshlib.make_mesh()
    params = cnn.init_params(jax.random.key(0), CFG)
    X, y = _data(rng)
    Xt, yt = _data(rng, 32)
    update_fn = dp.make_dp_sgd_update(CFG, mesh)
    res = step.fit(
        params, CFG, X, np.eye(2)[y], Xt, yt,
        epochs=6, lr=0.05, batch_size=16, update_fn=update_fn, seed=0,
    )
    assert res.best_val_acc >= 0.9


def test_dp_eval(rng):
    mesh = meshlib.make_mesh()
    params = cnn.init_params(jax.random.key(0), CFG)
    X, _ = _data(rng, 16)
    predict = dp.make_dp_eval(CFG, mesh)
    preds = predict(params, jnp.asarray(X))
    assert preds.shape == (16,)


def test_kfold_matches_sklearn():
    from sklearn.model_selection import KFold as SK

    ours = list(crossval.KFold(5).split(23))
    ref = list(SK(n_splits=5).split(np.zeros(23)))
    for (tr_a, te_a), (tr_b, te_b) in zip(ours, ref):
        np.testing.assert_array_equal(tr_a, tr_b)
        np.testing.assert_array_equal(te_a, te_b)


def test_cross_validate_mesh(rng):
    mesh = meshlib.make_mesh()
    X, y = _data(rng, 48)
    res = crossval.cross_validate(
        CFG, X, y, n_splits=2, epochs=3, lr=0.05, batch_size=8,
        mesh=mesh, seed=0,
    )
    assert len(res.fold_accuracies) == 2
    agg = res.aggregate_metrics()
    assert agg["n_splits"] == 2
    assert 0.0 <= agg["mean_accuracy"] <= 1.0
    assert set(res.fold_evaluations[0]) == {
        "test_accuracy", "confusion_matrix", "classification_report"
    }


@pytest.mark.slow
def test_graft_entry_single_and_multichip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 2)
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, atol=1e-5)

    ge.dryrun_multichip(8)


def test_bulk_classify_mesh_dp_matches_single(rng):
    """serve engine classify_batch shards over the 8-device mesh
    (EngineConfig.bulk_data_parallel) and matches the single-device
    program on a non-divisible batch (exercises the pad-and-trim)."""
    import dataclasses

    from cadx_tpu.serve.engine import EngineConfig, InferenceEngine

    cfg = EngineConfig(
        segment_hw=(64, 64), feature_resize=(16, 16),
        basic_classifier=cnn.CNNConfig(
            input_shape=(16, 16, 64), num_classes=2,
            conv_layers=((8, 3),), hidden_units=(32,), dropout_rate=0.0))
    imgs = (rng.random((5, 64, 64)) * 255).astype(np.uint8)  # 5 % 8 != 0

    eng_dp = InferenceEngine(cfg, seed=3)
    rows_dp = eng_dp.classify_batch(imgs)
    assert eng_dp.last_bulk_devices == len(jax.devices()) > 1

    eng_1 = InferenceEngine(
        dataclasses.replace(cfg, bulk_data_parallel=False), seed=3)
    rows_1 = eng_1.classify_batch(imgs)
    assert eng_1.last_bulk_devices == 1

    assert len(rows_dp) == len(rows_1) == 5
    for a, b in zip(rows_dp, rows_1):
        assert a["predicted_class"] == b["predicted_class"]
        np.testing.assert_allclose(a["prediction_probabilities"],
                                   b["prediction_probabilities"], atol=1e-5)
