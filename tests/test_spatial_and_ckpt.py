"""Spatial sharding (CP analogue), Orbax checkpoints, fit parity flags."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import jax as _jax

# these tests shard over an 8-device mesh (virtual CPU in CI); on the
# single real TPU (CADX_TEST_TPU=1) they cannot run
pytestmark = pytest.mark.skipif(
    _jax.device_count() < 8, reason="needs an 8-device mesh")

from cadx_tpu import checkpoint
from cadx_tpu.models import cnn, unet
from cadx_tpu.parallel import mesh as meshlib
from cadx_tpu.parallel import spatial
from cadx_tpu.train import step


def test_spatial_sharded_encoder_matches_single(rng):
    mesh = meshlib.make_mesh()
    params = unet.init_resnet_encoder(jax.random.key(0))
    img = jnp.asarray(rng.random((1, 256, 128, 1)), jnp.float32)

    ref = unet.encoder_first_features(params, img)
    run = spatial.make_spatial_encoder(mesh)
    out = run(params, img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # output H axis is actually sharded over all 8 devices
    assert len(out.sharding.device_set) == 8
    spec = out.sharding.spec
    assert spec[1] == "data"


def test_spatial_cleaner_stage(rng):
    mesh = meshlib.make_mesh()
    run = spatial.make_spatial_cleaner(mesh)
    img = jnp.asarray((rng.random((256, 128)) * 4000).astype(np.uint16))
    out = run(img)
    assert out.shape == (256, 128)
    assert set(np.unique(np.asarray(out))) <= {0, 255}


def test_orbax_roundtrip(tmp_path):
    config = cnn.CNNConfig(input_shape=(12, 12, 2), num_classes=2,
                           conv_layers=((4, 3),), hidden_units=(16,))
    params = cnn.init_params(jax.random.key(0), config)
    path = str(tmp_path / "ckpt")
    checkpoint.save_orbax(path, params)
    restored = checkpoint.load_orbax(path, like=params)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_parity_flags(rng):
    config = cnn.CNNConfig(input_shape=(12, 12, 2), num_classes=2,
                           conv_layers=((4, 3),), hidden_units=(16,),
                           dropout_rate=0.0)
    params = cnn.init_params(jax.random.key(0), config)
    y = rng.integers(0, 2, 16)
    X = rng.standard_normal((16, 12, 12, 2)).astype(np.float32)
    logs = []
    step.fit(params, config, X, np.eye(2)[y], X, y, epochs=1, lr=0.01,
             batch_size=8, log_fn=logs.append, eval_every_batch=True,
             log_weight_stats=True)
    text = "\n".join(logs)
    assert "BATCH 1" in text and "BATCH 2" in text   # per-batch eval lines
    assert "[Weight Stats]" in text and "mean=" in text


def test_grad_stats_helper(rng):
    config = cnn.CNNConfig(input_shape=(12, 12, 2), num_classes=2,
                           conv_layers=((4, 3),), hidden_units=(16,),
                           dropout_rate=0.0)
    params = cnn.init_params(jax.random.key(0), config)
    x = jnp.asarray(rng.standard_normal((4, 12, 12, 2)), jnp.float32)
    yb = jnp.asarray(np.eye(2)[rng.integers(0, 2, 4)], jnp.float32)
    _, grads = cnn.grads_fn(params, x, yb, config)
    lines = step.grad_stats(grads)
    assert len(lines) == len(jax.tree_util.tree_leaves(grads))
    assert all("mean=" in line for line in lines)
