"""Golden parity tests: TPU CNN vs the vectorized reference oracle.

Covers forward probs, full backward gradients (conv/dense/output + input
gradient used by saliency), tie-broadcast max-pool gradients, and npz
round-trip against the reference schema.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadx_tpu import checkpoint
from cadx_tpu.models import cnn
from cadx_tpu.ops.pool import max_pool_ties, max_pool_with_switches

from reference_oracle import OracleCNN, make_oracle_weights

CFG = dict(
    input_shape=(16, 16, 3),
    num_classes=2,
    conv_layers=[(4, 3), (8, 3)],
    hidden_units=[32, 16],
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


@pytest.fixture
def setup(rng):
    config = cnn.CNNConfig.from_json_dict(CFG)
    weights = make_oracle_weights(rng, CFG)
    oracle = OracleCNN(CFG, weights)
    params = _to_jax_params(weights)
    x = rng.standard_normal(CFG["input_shape"]).astype(np.float32)
    return config, oracle, params, x


def test_forward_parity(setup):
    config, oracle, params, x = setup
    probs_ref, _ = oracle.forward(x)
    probs_jax = cnn.forward(params, jnp.asarray(x)[None], config)[0]
    np.testing.assert_allclose(np.asarray(probs_jax), probs_ref, atol=2e-5)


def test_predict_batched(setup):
    config, oracle, params, x = setup
    batch = np.stack([x, x * 0.5, -x])
    classes, probs = cnn.predict(params, jnp.asarray(batch), config)
    for i in range(3):
        ref, _ = oracle.forward(batch[i])
        np.testing.assert_allclose(np.asarray(probs[i]), ref, atol=2e-5)
        assert int(classes[i]) == int(np.argmax(ref))


def test_grads_parity(setup):
    config, oracle, params, x = setup
    y = np.array([1.0, 0.0])
    _, cache = oracle.forward(x)
    ref_grads, ref_dinput = oracle.backward(cache, y)

    loss, grads = cnn.grads_fn(params, jnp.asarray(x)[None], jnp.asarray(y)[None], config)
    for i in range(len(params["conv"])):
        np.testing.assert_allclose(
            np.asarray(grads["conv"][i]["kernel"]).transpose(3, 0, 1, 2),
            ref_grads["conv_dF"][i], atol=3e-4,
        )
        np.testing.assert_allclose(
            np.asarray(grads["conv"][i]["bias"]), ref_grads["conv_db"][i], atol=3e-4
        )
    for i in range(len(params["dense"])):
        np.testing.assert_allclose(
            np.asarray(grads["dense"][i]["kernel"]).T, ref_grads["dense_dW"][i], atol=3e-4
        )
        np.testing.assert_allclose(
            np.asarray(grads["dense"][i]["bias"]), ref_grads["dense_db"][i], atol=3e-4
        )
    np.testing.assert_allclose(
        np.asarray(grads["output"]["kernel"]).T, ref_grads["output_dW"], atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(grads["output"]["bias"]), ref_grads["output_db"], atol=3e-4
    )

    # input gradient (saliency source): differentiate loss wrt x
    def loss_wrt_x(xin):
        return cnn.loss_fn(params, xin[None], jnp.asarray(y)[None], config)

    dinput = jax.grad(loss_wrt_x)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(dinput), ref_dinput, atol=3e-4)


def test_max_pool_tie_gradient():
    # 2x2 window with a tie: both tied cells must get the FULL gradient.
    x = jnp.array([[[[1.0], [1.0]], [[0.0], [-1.0]]]])  # (1,2,2,1) tie at max=1
    g = jax.grad(lambda v: jnp.sum(max_pool_ties(v)) * 3.0)(x)
    np.testing.assert_allclose(
        np.asarray(g)[0, :, :, 0], np.array([[3.0, 3.0], [0.0, 0.0]])
    )


def test_max_pool_switches_match_reference_shape():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 5, 7, 2)), jnp.float32)
    out, switches = max_pool_with_switches(x)
    assert out.shape == (1, 2, 3, 2)
    assert switches.shape == x.shape
    # odd remainder rows/cols never marked
    assert not bool(switches[:, 4:, :, :].any())
    assert not bool(switches[:, :, 6:, :].any())


def test_npz_roundtrip(tmp_path, setup):
    config, oracle, params, x = setup
    path = str(tmp_path / "cnn_model.npz")
    checkpoint.save_npz(params, config, path)

    # File must match the reference schema: config JSON + W{i}/b{i} keys
    data = np.load(path, allow_pickle=True)
    cfg = json.loads(str(data["config"]))
    assert cfg["conv_layers"] == [list(c) for c in CFG["conv_layers"]]
    idx = config.layer_indices()
    assert f"W{idx['conv'][0]}" in data and f"W{idx['output']}" in data
    # conv arrays in reference (F,k,k,C) layout
    assert data[f"W{idx['conv'][0]}"].shape == (4, 3, 3, 3)

    config2, params2 = checkpoint.load_npz(path)
    assert config2 == config
    p1 = cnn.forward(params, jnp.asarray(x)[None], config)
    p2 = cnn.forward(params2, jnp.asarray(x)[None], config2)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_init_shapes():
    config = cnn.CNNConfig.from_json_dict(CFG)
    params = cnn.init_params(jax.random.key(0), config)
    assert params["conv"][0]["kernel"].shape == (3, 3, 3, 4)
    assert params["conv"][1]["kernel"].shape == (3, 3, 4, 8)
    assert params["dense"][0]["kernel"].shape == (config.flatten_size(), 32)
    assert params["output"]["kernel"].shape == (16, 2)
    # flatten arithmetic matches reference valid-conv + pool chain
    # 16 -> 14 -> 7 -> 5 -> 2 ; so flatten = 2*2*8 = 32
    assert config.flatten_size() == 32


def test_reference_softmax_guards():
    z = jnp.array([1000.0, -1000.0])  # clipping kicks in
    p = cnn.reference_softmax(z)
    np.testing.assert_allclose(float(jnp.sum(p)), 1.0, atol=1e-6)
    assert float(p[0]) > 0.999


def test_npz_load_error_messages(tmp_path, setup):
    """Format errors get the schema message; env errors pass through."""
    config, _, params, _ = setup
    # garbage file -> ValueError naming the schema
    bad = tmp_path / "bad.npz"
    bad.write_bytes(b"garbage")
    with pytest.raises(ValueError, match="reference schema"):
        checkpoint.load_npz(str(bad))
    # valid config but missing weight arrays -> also the schema message
    import numpy as _np

    truncated = tmp_path / "trunc.npz"
    _np.savez(str(truncated), config=json.dumps(config.to_json_dict()))
    with pytest.raises(ValueError, match="reference schema"):
        checkpoint.load_npz(str(truncated))
    # missing file stays FileNotFoundError
    with pytest.raises(FileNotFoundError):
        checkpoint.load_npz(str(tmp_path / "nope.npz"))
