"""U-Net segmentation training + 2D (data x spatial) sharding tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadx_tpu.models import unet
from cadx_tpu.parallel import mesh as meshlib
from cadx_tpu.train import segmentation as seg


def _blob_data(rng, n=32, hw=32):
    """Images with a bright disk; mask = the disk."""
    X = rng.random((n, hw, hw, 1)).astype(np.float32) * 0.3
    Y = np.zeros((n, hw, hw, 1), np.float32)
    yy, xx = np.mgrid[0:hw, 0:hw]
    for i in range(n):
        cy, cx = rng.integers(8, hw - 8, 2)
        r = rng.integers(4, 8)
        disk = ((yy - cy) ** 2 + (xx - cx) ** 2) < r * r
        X[i, disk, 0] += 0.6
        Y[i, disk, 0] = 1.0
    return X, Y


@pytest.mark.slow
def test_unet_segmentation_learns(rng):
    config = unet.UNetConfig(features=(8, 16, 32))
    params = unet.init_unet(jax.random.key(0), config)
    X, Y = _blob_data(rng)
    Xv, Yv = _blob_data(rng, n=8)
    res = seg.fit_segmentation(params, config, X, Y, Xv, Yv,
                               epochs=14, lr=3e-3, batch_size=8)
    assert res.history[-1]["val_dice"] > 0.8, res.history[-1]
    assert res.history[-1]["loss"] < res.history[0]["loss"]


def test_unet_segmentation_on_mesh(rng):
    if jax.device_count() < 8:
        pytest.skip("needs an 8-device mesh")
    mesh = meshlib.make_mesh()
    config = unet.UNetConfig(features=(8, 16))
    params = unet.init_unet(jax.random.key(0), config)
    X, Y = _blob_data(rng, n=16)
    res = seg.fit_segmentation(params, config, X, Y, X[:8], Y[:8],
                               epochs=2, lr=3e-3, batch_size=8, mesh=mesh)
    assert len(res.history) == 2
    assert np.isfinite(res.history[-1]["loss"])


def test_2d_data_by_spatial_sharding(rng):
    """Encoder conv with batch on 'data' AND height on 'model' — a true
    2D sharding with halo exchanges in both partitioned conv dims."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if jax.device_count() < 8:
        pytest.skip("needs an 8-device mesh")

    mesh = meshlib.make_mesh(n_data=4, n_model=2)
    params = unet.init_resnet_encoder(jax.random.key(0))
    img = jnp.asarray(rng.random((4, 128, 128, 1)), jnp.float32)

    sharding_2d = NamedSharding(mesh, P("data", "model", None, None))
    repl = NamedSharding(mesh, P())

    run = jax.jit(unet.encoder_first_features,
                  in_shardings=(repl, sharding_2d),
                  out_shardings=sharding_2d)
    out = run(params, img)
    ref = unet.encoder_first_features(params, img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    assert len(out.sharding.device_set) == 8
