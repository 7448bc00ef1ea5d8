"""End-to-end fused-pipeline parity vs a reference-composed path.

Composes the pipeline from reference parts — the reference's own cv2
DMImagePreprocessor for cleaning and the reference's own CNNModel code
for classification — around our encoder (shared weights), and compares
against run_pipeline on the same raw images with the same weights.

The watershed stage is tolerance-contracted (flood-queue tie-breaking),
so features can differ slightly near the pectoral ridge; predictions and
probabilities must still agree closely.
"""

import importlib.util
import os
import types

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadx_tpu.models import cnn
from cadx_tpu.pipeline import fused

REF_CLEANER = "/root/reference/WebApplicationPrototype/customImageCleaner.py"
REF_CNN = "/root/reference/Classes/CNNModel.py"


@pytest.fixture(scope="module")
def ref_parts():
    if not (os.path.exists(REF_CLEANER) and os.path.exists(REF_CNN)):
        pytest.skip("reference not available")
    spec = importlib.util.spec_from_file_location("ref_cleaner2", REF_CLEANER)
    cleaner_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cleaner_mod)

    src = open(REF_CNN).read()
    src = src.replace("sys.stdout = Logger(sys.stdout, log_file)", "pass")
    src = src.replace('log_file = open("Training_And_Validation.txt", "w")',
                      "log_file = None")
    src = src[: src.find("Model = load_weights(")]
    cnn_mod = types.ModuleType("ref_cnn2")
    exec(compile(src, REF_CNN, "exec"), cnn_mod.__dict__)
    return cleaner_mod.DMImagePreprocessor(), cnn_mod


def _mammo(rng, hw=128):
    img = np.zeros((hw, hw), np.uint8)
    breast = np.zeros((hw, hw), np.uint8)
    cv2.ellipse(breast, (hw - 1, hw // 2), (hw // 2, hw // 2), 0, 90, 270, 255, -1)
    tissue = (110 + rng.normal(0, 25, (hw, hw))).clip(40, 185).astype(np.uint8)
    img[breast > 0] = tissue[breast > 0]
    yy, xx = np.mgrid[0:hw, 0:hw]
    wedge = ((hw - 1 - xx) + yy) < hw // 4
    img[wedge] = np.maximum(img[wedge], 230)
    return cv2.GaussianBlur(img, (5, 5), 2)


@pytest.mark.slow
def test_fused_pipeline_matches_reference_composition(ref_parts, tmp_path, rng):
    preproc, ref_cnn_mod = ref_parts
    hw = 128
    config = fused.PipelineConfig(
        image_hw=(hw, hw), feature_hw=(16, 16),
        classifier=cnn.CNNConfig(input_shape=(16, 16, 64), num_classes=2,
                                 conv_layers=((8, 3),), hidden_units=(32,),
                                 dropout_rate=0.0))
    params = fused.init_pipeline_params(jax.random.key(0), config)

    # reference CNNModel instance carrying OUR classifier weights
    from cadx_tpu import checkpoint

    npz = str(tmp_path / "m.npz")
    checkpoint.save_npz(params.classifier, config.classifier, npz)
    ref_model = ref_cnn_mod.load_weights(ref_cnn_mod.CNNModel, npz)

    batch = np.stack([_mammo(rng), _mammo(rng)])
    ours = fused.run_pipeline(params, jnp.asarray(batch), config)

    from cadx_tpu.models import unet
    from cadx_tpu.ops.resize import resize_linear

    for i in range(len(batch)):
        img = batch[i]
        # reference cleaning chain (unet_process_single_image, app.py:96-150)
        raw8 = ((img.astype(np.float32) / img.max()) * 255).astype(np.uint8)
        sup, mask = preproc.suppress_artifacts(raw8, global_threshold=0.05,
                                               fill_holes=True,
                                               smooth_boundary=True,
                                               kernel_size=15)
        seg, _ = preproc.segment_breast(sup, low_int_threshold=0.05, crop=False)
        _, img_col = preproc.remove_pectoral(seg, mask, high_int_threshold=0.8,
                                             morph_kn_size=3, n_morph_op=7,
                                             sm_kn_size=25)
        gray = cv2.cvtColor(img_col.astype(np.float32), cv2.COLOR_BGR2GRAY)

        # our encoder + resize with the same weights
        feats = unet.encoder_first_features(
            params.encoder, jnp.asarray(gray / 255.0)[None, ..., None])[0]
        feats16 = np.asarray(resize_linear(feats, (16, 16)))

        # reference classifier code
        ref_probs = ref_model.forward(feats16, training=False)
        our_probs = np.asarray(ours.probs[i])

        # cleaning stages agree within the watershed tolerance; the
        # classifier downstream must agree closely
        assert int(np.argmax(ref_probs)) == int(ours.predicted[i])
        np.testing.assert_allclose(our_probs, ref_probs, atol=0.05)

        # clean display images agree on most pixels
        ours_clean = np.asarray(ours.clean_u8[i]).astype(np.int32)
        ref_clean = np.clip(np.round(gray), 0, 255).astype(np.int32)
        frac_close = (np.abs(ours_clean - ref_clean) <= 2).mean()
        assert frac_close > 0.92, frac_close  # watershed ridge pixels differ
