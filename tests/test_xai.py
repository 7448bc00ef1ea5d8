"""XAI parity tests: saliency vs the NumPy oracle backward, overlay
composition vs cv2, Grad-CAM vs a hand-computed NumPy oracle."""

import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from cadx_tpu.models import cnn
from cadx_tpu.xai import gradcam, saliency

from reference_oracle import OracleCNN, make_oracle_weights

CFG = dict(
    input_shape=(16, 16, 3),
    num_classes=2,
    conv_layers=[(4, 3), (8, 3)],
    hidden_units=[32],
    dropout_rate=0.0,
    leaky_alpha=0.01,
)


def _setup(rng):
    config = cnn.CNNConfig.from_json_dict(CFG)
    weights = make_oracle_weights(rng, CFG)
    oracle = OracleCNN(CFG, weights)
    params = {
        "conv": [
            {"kernel": jnp.asarray(f.transpose(1, 2, 3, 0), jnp.float32),
             "bias": jnp.asarray(b, jnp.float32)}
            for f, b in zip(weights["conv_filters"], weights["conv_biases"])
        ],
        "dense": [
            {"kernel": jnp.asarray(W.T, jnp.float32), "bias": jnp.asarray(b, jnp.float32)}
            for W, b in zip(weights["dense_weights"], weights["dense_biases"])
        ],
        "output": {"kernel": jnp.asarray(weights["output_weights"].T, jnp.float32),
                   "bias": jnp.asarray(weights["output_biases"], jnp.float32)},
    }
    x = rng.standard_normal(CFG["input_shape"]).astype(np.float32)
    return config, oracle, params, x


def test_input_gradient_matches_oracle(rng):
    config, oracle, params, x = _setup(rng)
    for class_idx in (0, 1):
        y = np.eye(2)[class_idx]
        _, cache = oracle.forward(x)
        _, ref_dinput = oracle.backward(cache, y)
        ours = np.asarray(saliency.input_gradient(params, jnp.asarray(x),
                                                  class_idx, config))
        np.testing.assert_allclose(ours, ref_dinput, atol=1e-5)


def test_saliency_overlay_matches_cv2_composition(rng):
    config, oracle, params, x = _setup(rng)
    display = rng.integers(0, 256, (64, 64), dtype=np.uint8)

    ov, hm = saliency.saliency_overlay(params, jnp.asarray(x), jnp.asarray(display),
                                       0, config, (64, 64))

    # reference composition in cv2 from the oracle's d_input
    _, cache = oracle.forward(x)
    _, d_input = oracle.backward(cache, np.eye(2)[0])
    s = np.abs(d_input).max(axis=-1)
    s = (s - s.min()) / (s.max() - s.min() + 1e-8)
    s = np.uint8(s * 255)
    heat_ref = cv2.applyColorMap(s, cv2.COLORMAP_JET)
    heat_ref = cv2.resize(heat_ref, (64, 64))
    disp3 = cv2.cvtColor(display, cv2.COLOR_GRAY2BGR)
    ov_ref = cv2.addWeighted(disp3, 0.5, heat_ref, 0.5, 0)

    # f32-vs-f64 truncation can shift a saliency value by 1/255, which the
    # JET LUT amplifies to a few counts on isolated pixels
    dh = np.abs(np.asarray(hm).astype(int) - heat_ref.astype(int))
    do = np.abs(np.asarray(ov).astype(int) - ov_ref.astype(int))
    assert np.quantile(dh, 0.99) <= 2 and dh.max() <= 8
    assert np.quantile(do, 0.99) <= 2 and do.max() <= 8


def test_saliency_files_written(tmp_path, rng):
    config, _, params, x = _setup(rng)
    display = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    out = saliency.generate_dual_class_overlays(
        params, config, x, display, (0, 1), str(tmp_path))
    for c in (0, 1):
        assert os.path.exists(tmp_path / f"overlay_class_{c}.png")
        assert os.path.exists(tmp_path / f"heatmap_class_{c}.png")
        assert out[c][0].shape == (32, 32, 3)


def test_gradcam_matches_numpy_oracle(rng):
    config, oracle, params, x = _setup(rng)
    # oracle CAM: run oracle forward caching conv activations, compute
    # d(logit_c)/d(last pooled activations) by finite chain through dense
    probs, cache = oracle.forward(x)

    # last pooled activations from the oracle caches
    oh, ow, C = cache["pool"][-1]["out_shape"]
    # recompute pooled output: forward stores only inputs; redo pooling
    act = cache["conv"][-1]["output"]
    core = act[: oh * 2, : ow * 2, :].reshape(oh, 2, ow, 2, C)
    pooled = core.max(axis=(1, 3))

    # analytic d logit_c / d pooled via dense chain (LeakyReLU masks)
    alpha = config.leaky_alpha
    W1 = np.asarray(params["dense"][0]["kernel"])   # (in, units)
    Wo = np.asarray(params["output"]["kernel"])     # (units, 2)
    z1 = cache["dense"][0]["z"]
    for class_idx in (0, 1):
        d_hidden = Wo[:, class_idx]                       # dlogit/dh
        dz1 = d_hidden * np.where(z1 > 0, 1.0, alpha)
        d_flat = W1 @ dz1                                 # dlogit/dflat
        grads = d_flat.reshape(oh, ow, C)
        w = grads.mean(axis=(0, 1))
        cam_ref = np.maximum((pooled * w).sum(-1), 0)
        cam_ref = (cam_ref - cam_ref.min()) / (cam_ref.max() - cam_ref.min() + 1e-7)

        ours = np.asarray(gradcam.gradcam_map(params, jnp.asarray(x), class_idx, config))
        np.testing.assert_allclose(ours, cam_ref, atol=1e-4)


def test_gradcam_overlay_show_cam_semantics(rng):
    config, _, params, x = _setup(rng)
    display = rng.integers(0, 256, (48, 48), dtype=np.uint8)
    ov, hm = gradcam.gradcam_overlay(params, jnp.asarray(x), jnp.asarray(display),
                                     1, config, (48, 48))
    ov, hm = np.asarray(ov), np.asarray(hm)
    assert ov.shape == (48, 48, 3) and hm.shape == (48, 48)

    # recompute show_cam_on_image in numpy from our heatmap
    jet = cv2.applyColorMap(hm, cv2.COLORMAP_JET).astype(np.float32) / 255.0
    jet_rgb = jet[..., ::-1]
    img_f = np.stack([display] * 3, -1).astype(np.float32) / 255.0
    cam_img = jet_rgb + img_f
    cam_img = cam_img / cam_img.max()
    ref = (cam_img * 255).astype(np.uint8)
    assert np.abs(ov.astype(int) - ref.astype(int)).max() <= 2


def test_gradcam_files_written(tmp_path, rng):
    config, _, params, x = _setup(rng)
    display = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    out = gradcam.generate_dual_class_gradcam_overlays(
        params, config, x, display, (0, 1), str(tmp_path))
    for c in (0, 1):
        assert os.path.exists(tmp_path / f"gradcam_overlay_class_{c}.png")
        assert os.path.exists(tmp_path / f"gradcam_heatmap_class_{c}.png")
