"""Fused pipeline integration tests (CPU; perf is bench.py's job)."""

import dataclasses

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadx_tpu.models import cnn
from cadx_tpu.pipeline import fused


def _mammo_batch(rng, b=2, hw=64):
    out = np.zeros((b, hw, hw), np.uint8)
    for i in range(b):
        breast = np.zeros((hw, hw), np.uint8)
        cv2.ellipse(breast, (hw - 1, hw // 2), (hw // 2, hw // 2), 0, 90, 270, 255, -1)
        tissue = (110 + rng.normal(0, 25, (hw, hw))).clip(40, 185).astype(np.uint8)
        out[i][breast > 0] = tissue[breast > 0]
        yy, xx = np.mgrid[0:hw, 0:hw]
        wedge = ((hw - 1 - xx) + yy) < hw // 4
        out[i][wedge] = np.maximum(out[i][wedge], 230)
    return out


def _tiny_config():
    return fused.PipelineConfig(
        image_hw=(64, 64),
        feature_hw=(16, 16),
        feature_dtype="bfloat16",  # exercise the opt-in bench/serving mode;
        # the f32 default is re-checked explicitly in the stages test
        classifier=cnn.CNNConfig(
            input_shape=(16, 16, 64),
            num_classes=2,
            conv_layers=((8, 3),),
            hidden_units=(32,),
            dropout_rate=0.0,
        ),
    )


def test_pipeline_end_to_end(rng):
    config = _tiny_config()
    params = fused.init_pipeline_params(jax.random.key(0), config)
    batch = _mammo_batch(rng)
    out = fused.run_pipeline(params, jnp.asarray(batch), config)

    b = batch.shape[0]
    assert out.probs.shape == (b, 2)
    np.testing.assert_allclose(np.asarray(out.probs).sum(-1), 1.0, atol=1e-5)
    assert out.predicted.shape == (b,)
    assert out.clean_u8.shape == (b, 64, 64)
    assert out.features.shape == (b, 16, 16, 64)
    assert out.overlays.shape == (b, 2, 64, 64, 3)
    assert out.heatmaps.shape == (b, 2, 64, 64)
    assert out.overlays.dtype == jnp.uint8
    # cleaning must actually suppress the isolated background (left side)
    assert np.asarray(out.clean_u8)[:, :, :4].mean() < 60


@pytest.mark.slow
def test_pipeline_stages_consistent_with_components(rng):
    """Pipeline output == composing the stage functions manually."""
    config = _tiny_config()
    params = fused.init_pipeline_params(jax.random.key(0), config)
    batch = jnp.asarray(_mammo_batch(rng, b=1))
    out = fused.run_pipeline(params, batch, config)

    clean01 = jax.vmap(fused._clean_one)(batch)
    from cadx_tpu.models import unet
    from cadx_tpu.ops.resize import resize_linear

    feats = unet.encoder_first_features(params.encoder, clean01[..., None])
    # the pipeline stores features at config.feature_dtype (bf16 here)
    feats_cast = feats.astype(jnp.dtype(config.feature_dtype))
    feats_small = jax.vmap(
        lambda f: resize_linear(f.astype(jnp.float32), (16, 16)))(feats_cast)
    probs = cnn.forward(params.classifier, feats_small, config.classifier)
    # bf16 feature storage: the fused program's conv output can differ
    # from the standalone program's by 1 f32 ULP, which a bf16 rounding
    # boundary amplifies to one bf16 step (~1e-3 relative) on a handful
    # of elements — compare at bf16 scale here, bit-exact below with
    # feature_dtype="float32"
    np.testing.assert_allclose(np.asarray(out.probs), np.asarray(probs), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.features), np.asarray(feats_small),
                               atol=2e-3)

    cfg_f32 = dataclasses.replace(config, feature_dtype="float32")
    out32 = fused.run_pipeline(params, batch, cfg_f32)
    feats_small32 = jax.vmap(lambda f: resize_linear(f, (16, 16)))(feats)
    probs32 = cnn.forward(params.classifier, feats_small32, config.classifier)
    np.testing.assert_allclose(np.asarray(out32.probs), np.asarray(probs32),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out32.features),
                               np.asarray(feats_small32), atol=1e-6)
    # and the MXU form tracks the gather form to float tolerance
    mxu = fused._resize_feats_mxu(feats_cast.astype(jnp.float32), (16, 16))
    np.testing.assert_allclose(np.asarray(mxu), np.asarray(feats_small),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_checksum_runs(rng):
    config = _tiny_config()
    params = fused.init_pipeline_params(jax.random.key(0), config)
    batch = _mammo_batch(rng)
    s = fused.run_pipeline_checksum(params, jnp.asarray(batch), config)
    assert np.isfinite(float(s))


def test_pipeline_gradcam_matches_single(rng):
    """Batched pipeline Grad-CAM == the xai module's per-sample CAM."""
    from cadx_tpu.xai import gradcam

    config = _tiny_config()
    params = fused.init_pipeline_params(jax.random.key(0), config)
    batch = jnp.asarray(_mammo_batch(rng, b=2))
    out = fused.run_pipeline(params, batch, config)

    feats = np.asarray(out.features)
    for i in range(2):
        cam = gradcam.gradcam_map(params.classifier, jnp.asarray(feats[i]), 0,
                                  config.classifier)
        from cadx_tpu.ops.resize import resize_linear

        cam_big = np.clip(np.asarray(resize_linear(cam, (64, 64))), 0, 1)
        hm_ref = (cam_big * 255).astype(np.uint8)
        # differently-fused XLA programs can flip the uint8 edge by 1 on TPU
        diff = np.abs(np.asarray(out.heatmaps)[i, 0].astype(int) - hm_ref.astype(int))
        assert diff.max() <= 1, diff.max()
