"""Full-resolution (native ~4K mammogram) ingest policy (VERDICT r3 #3).

The reference cleans at whatever resolution cv2 receives — CBIS-DDSM
originals are ~4Kx3K — then resizes to 512 (app.py:96-141). On this
runtime a full-native cleaning program would pay a fresh 20-300s remote
compile per unseen camera resolution and an unmeasured XLA watershed
cost (the Pallas gates all reject beyond ~512). Policy
(EngineConfig.native_clean_max_side, engine.bucket_clean_hw): oversized
natives are area-downscaled to a BUCKETED shape by a cheap separate
program, so the expensive cleaning program compiles for a bounded shape
set. These tests pin the bucket math, the gate rejections at real
native sizes, the end-to-end bucketed path with a 16-bit ~2Kx1.7K
input (cheap: cleaning runs at the capped size), trace-correctness of
the uncapped path at the true CBIS-DDSM size (eval_shape — no
execution), and the capped-vs-native cleaning parity bound.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadx_tpu.models.cnn import CNNConfig
from cadx_tpu.ops import components
from cadx_tpu.serve.engine import EngineConfig, InferenceEngine, bucket_clean_hw


def _mammo(h, w, seed=0, dtype=np.uint16, top=60000):
    """Synthetic mammogram at native depth: breast ellipse + pectoral
    wedge, background zeros (like real CBIS-DDSM crops)."""
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), dtype)
    breast = np.zeros((h, w), np.uint8)
    cv2.ellipse(breast, (w - 1, h // 2), (int(w * 0.7), int(h * 0.45)),
                0, 90, 270, 255, -1)
    tissue = (top * 0.45 + rng.normal(0, top * 0.1, (h, w))).clip(
        top * 0.15, top * 0.75).astype(dtype)
    img[breast > 0] = tissue[breast > 0]
    yy, xx = np.mgrid[0:h, 0:w]
    wedge = ((w - 1 - xx) / w + yy / h) < 0.25
    img[wedge] = np.maximum(img[wedge], dtype(top * 0.9))
    return img


def _engine(segment_hw=(128, 128), cap=1536):
    return InferenceEngine(EngineConfig(
        segment_hw=segment_hw, feature_resize=(8, 8),
        native_clean_max_side=cap,
        basic_classifier=CNNConfig(
            input_shape=(8, 8, 64), num_classes=2,
            conv_layers=((4, 3),), hidden_units=(8,), dropout_rate=0.0)))


def test_bucket_clean_hw_math():
    # long side == cap, short side 128-multiple <= cap, orientation kept
    assert bucket_clean_hw(4096, 3328, 1536) == (1536, 1280)
    assert bucket_clean_hw(3328, 2560, 1536) == (1536, 1280)
    assert bucket_clean_hw(2560, 3328, 1536) == (1280, 1536)
    assert bucket_clean_hw(4000, 4000, 1536) == (1536, 1536)
    assert bucket_clean_hw(10000, 500, 1536) == (1536, 128)
    for h, w in [(3328, 2560), (2000, 1700), (5000, 900)]:
        bh, bw = bucket_clean_hw(h, w, 1536)
        assert max(bh, bw) == 1536 and min(bh, bw) % 128 == 0
        assert (bh >= bw) == (h >= w)
    # the distinct-shape set is bounded: short side has <= cap/128 values
    shapes = {bucket_clean_hw(4096, w, 1536) for w in range(300, 4096, 37)}
    assert len(shapes) <= 1536 // 128


def test_pallas_gates_reject_native_sizes(monkeypatch):
    """Every Pallas gate must reject full-native planes (67MB at 4K vs
    the 14MB VMEM budget) AND the capped cleaning sizes (1536 > 512 cap):
    full-res cleaning is always the XLA path."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("CADX_DISABLE_PALLAS", raising=False)
    for h, w in [(4096, 3328), (3328, 2560), (1536, 1280), (1536, 1536)]:
        assert not components._use_pallas(h, w), (h, w)
        assert not components._use_pallas(h, w, planes=16), (h, w)


def test_oversized_native_16bit_end_to_end():
    """A ~2Kx1.7K 16-bit native upload goes through the bucketed-clean
    path end to end: the downscale program absorbs the raw resolution,
    cleaning runs at the capped shape, features/clean come back at the
    configured contract shapes, and classify works on the result."""
    eng = _engine(cap=256)
    img = _mammo(2080, 1696)  # uint16, native depth
    feats, clean = eng.process_single_image(img, cache_token="big")
    assert feats.shape == (64, 64, 64)     # CHW at segment_hw/2
    assert clean.shape == (128, 128) and clean.dtype == np.uint8
    assert (clean > 0).mean() > 0.1        # real breast tissue survived
    # the expensive program compiled at the BUCKETED shape, not native
    assert bucket_clean_hw(2080, 1696, 256) == (256, 256)
    out = eng.classify(feats, "basic", cache_token="big")
    assert out["predicted_class"] in ("Benign", "Malignant")


def test_uncapped_native_traces_at_cbis_size():
    """cap=None (reference behavior) must still BUILD the full cleaning
    program at the true CBIS-DDSM scale — eval_shape catches shape/dtype
    bugs in the 4K path without paying the execution."""
    eng = _engine(cap=None)
    spec = jax.ShapeDtypeStruct((3328, 2560), jnp.uint16)
    feats, clean = jax.eval_shape(eng._segment_jit, spec)
    assert feats.shape == (64, 64, 64)
    assert clean.shape == (128, 128) and clean.dtype == jnp.uint8


@pytest.mark.slow
def test_capped_vs_native_clean_parity():
    """Divergence bound for the capping policy: cleaning at the bucketed
    resolution then resizing to segment_hw must agree with cleaning at
    native resolution (reference order) on the breast mask (IoU) and
    the kept-tissue intensities."""
    img = _mammo(512, 416)
    native = _engine(cap=None)
    capped = _engine(cap=256)
    assert bucket_clean_hw(512, 416, 256) == (256, 256)

    _, clean_native = native.process_single_image(img)
    _, clean_capped = capped.process_single_image(img)
    a, b = clean_native > 0, clean_capped > 0
    iou = (a & b).sum() / max((a | b).sum(), 1)
    assert iou > 0.90, f"breast-mask IoU {iou:.3f}"
    both = a & b
    diff = np.abs(clean_native.astype(np.float32)
                  - clean_capped.astype(np.float32))[both]
    # intensities differ mainly through equalizeHist, whose CDF depends on
    # the cleaning resolution (measured ~25/255 mean at 512-vs-256); the
    # structural agreement above (IoU) is the primary bound
    assert diff.mean() < 35.0, f"mean |diff| on kept tissue {diff.mean():.1f}"


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="real-native-resolution variant runs on TPU only")
def test_fullres_default_policy_tpu():
    """Opt-in (CADX_TEST_TPU=1): the DEFAULT engine policy on a real
    CBIS-DDSM-sized 16-bit upload — downscale at native, clean at the
    1536-bucket, classify — all on the real chip."""
    eng = InferenceEngine(EngineConfig())
    img = _mammo(3328, 2560)
    feats, clean = eng.process_single_image(img, cache_token="cbis")
    assert feats.shape == (64, 256, 256)
    assert clean.shape == (512, 512)
    assert (clean > 0).mean() > 0.1
    out = eng.classify(feats, "basic", cache_token="cbis")
    assert out["predicted_class"] in ("Benign", "Malignant")
