"""Image-cleaner parity vs the reference DMImagePreprocessor.

The reference module (customImageCleaner.py) is imported directly from
/root/reference as the golden oracle; stages with exact contracts
(threshold, largest-object, masking) must match near-bitwise, the
watershed stage within IoU tolerance (flood-queue tie-breaking differs).
"""

import importlib.util
import os

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from cadx_tpu.preprocess import cleaner

REF = "/root/reference/WebApplicationPrototype/customImageCleaner.py"


@pytest.fixture(scope="module")
def ref_preprocessor():
    if not os.path.exists(REF):
        pytest.skip("reference not available")
    spec = importlib.util.spec_from_file_location("ref_cleaner", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.DMImagePreprocessor()


@pytest.fixture(scope="module")
def mammo():
    """Synthetic MLO-view mammogram: breast half-ellipse at the RIGHT
    edge (chest wall right), bright pectoral wedge top-right, scanner
    artifacts on the left.

    Right-orientation matters for the oracle: the reference passes its
    flood-fill seed as (row, col) where cv2 expects (x, y)
    (customImageCleaner.py:70-74). With the left column background, the
    transposed seed still lands in background — as on real mammograms —
    so the reference behaves as intended and is a valid oracle. (Our
    implementation fills holes by border connectivity and has no such
    orientation sensitivity.)"""
    h = w = 256
    rng = np.random.default_rng(42)
    img = np.zeros((h, w), np.uint8)
    # textured breast tissue (uniform tissue would equalize to all-bright
    # and the pectoral threshold would swallow the whole breast)
    breast = np.zeros((h, w), np.uint8)
    cv2.ellipse(breast, (255, 128), (120, 120), 0, 90, 270, 255, -1)
    tissue = (110 + rng.normal(0, 25, (h, w))).clip(40, 185).astype(np.uint8)
    img[breast > 0] = tissue[breast > 0]
    yy, xx = np.mgrid[0:h, 0:w]
    wedge = ((w - 1 - xx) + yy) < 70
    img[wedge] = np.maximum(img[wedge], 230)                       # pectoral
    cv2.circle(img, (30, 40), 9, 255, -1)                          # artifact
    cv2.rectangle(img, (10, 200), (40, 215), 200, -1)              # tag
    img = cv2.GaussianBlur(img, (5, 5), 2)
    return img


def _iou(a, b):
    a, b = np.asarray(a) > 0, np.asarray(b) > 0
    return (a & b).sum() / max((a | b).sum(), 1)


def test_suppress_artifacts_parity(ref_preprocessor, mammo):
    ref_img, ref_mask = ref_preprocessor.suppress_artifacts(
        mammo, global_threshold=0.05, fill_holes=True,
        smooth_boundary=True, kernel_size=15)
    ours_img, ours_mask = cleaner.suppress_artifacts(jnp.asarray(mammo), 0.05, 15)
    assert _iou(ours_mask, ref_mask) > 0.995
    # suppressed image equal wherever masks agree
    agree = (np.asarray(ours_mask) > 0) == (ref_mask > 0)
    np.testing.assert_array_equal(np.asarray(ours_img)[agree], ref_img[agree])


def test_segment_breast_parity(ref_preprocessor, mammo):
    sup, _ = ref_preprocessor.suppress_artifacts(mammo, global_threshold=0.05,
                                                 fill_holes=True,
                                                 smooth_boundary=True)
    ref_img, ref_rect = ref_preprocessor.segment_breast(sup, low_int_threshold=0.05,
                                                        crop=False)
    ours_img, ours_rect = cleaner.segment_breast_mask(jnp.asarray(sup), 0.05)
    assert _iou(np.asarray(ours_img) > 0, ref_img > 0) > 0.99
    ours_rect = tuple(int(v) for v in ours_rect)
    assert ours_rect == tuple(ref_rect)


def test_remove_pectoral_parity(ref_preprocessor, mammo):
    sup, mask = ref_preprocessor.suppress_artifacts(mammo, global_threshold=0.05,
                                                    fill_holes=True,
                                                    smooth_boundary=True)
    seg, _ = ref_preprocessor.segment_breast(sup, low_int_threshold=0.05, crop=False)
    ref_breast_only, ref_col = ref_preprocessor.remove_pectoral(
        seg, mask, high_int_threshold=0.8, morph_kn_size=3, n_morph_op=7,
        sm_kn_size=25)

    res = cleaner.remove_pectoral(jnp.asarray(seg), jnp.asarray(mask),
                                  0.8, 3, 7, 25)
    assert (ref_breast_only > 0).sum() > 500, "oracle mask degenerate"
    # breast-tissue masks agree within watershed tolerance (measured
    # 0.9725 on this fixture once the cv2 border ridge was reproduced;
    # the remaining gap is interior flood-queue tie-breaking)
    assert _iou(res.breast_only_mask, ref_breast_only > 0) > 0.95
    # equalized image identical (deterministic stage)
    ref_equ = cv2.equalizeHist(seg)
    np.testing.assert_array_equal(np.asarray(res.img_equ), ref_equ)


def test_clean_for_unet_shape_and_range(mammo):
    out = cleaner.clean_for_unet(jnp.asarray(mammo))
    out = np.asarray(out)
    assert out.shape == (512, 512)
    assert 0.0 <= out.min() and out.max() <= 1.0
    assert out.std() > 0.01  # not degenerate


def test_process_orchestration(mammo):
    img_proc, res = cleaner.process(jnp.asarray(mammo), median_filtering=True,
                                    pect_removal=True)
    assert img_proc.shape == mammo.shape
    assert res is not None


def test_bounding_rect_matches_cv2(rng):
    mask = np.zeros((64, 64), bool)
    mask[10:30, 5:50] = True
    x, y, w, h = (int(v) for v in cleaner._bounding_rect(jnp.asarray(mask)))
    rx, ry, rw, rh = cv2.boundingRect(mask.astype(np.uint8))
    assert (x, y, w, h) == (rx, ry, rw, rh)


def test_absolute_threshold_branch(ref_preprocessor, mammo):
    """Thresholds >= 1.0 are ABSOLUTE pixel values like the reference."""
    ref_img, ref_mask = ref_preprocessor.suppress_artifacts(
        mammo, global_threshold=30, fill_holes=True, smooth_boundary=True,
        kernel_size=15)
    ours_img, ours_mask = cleaner.suppress_artifacts(jnp.asarray(mammo), 30, 15)
    assert _iou(ours_mask, ref_mask) > 0.99


def test_uint16_suppress_preserves_depth(mammo):
    """uint16 inputs keep their high byte through the mask AND."""
    img16 = (mammo.astype(np.uint16) * 257)  # spread to 16-bit range
    out, mask = cleaner.suppress_artifacts(jnp.asarray(img16), 0.05, 15)
    out = np.asarray(out)
    assert out.dtype == np.uint16
    assert out.max() > 255  # high byte survived
    inside = np.asarray(mask) > 0
    np.testing.assert_array_equal(out[inside], img16[inside])


def test_ring_artifact_interior_not_added(ref_preprocessor):
    """Holes of NON-largest objects stay background (the reference floods
    largest_mask with other objects zeroed)."""
    img = np.zeros((128, 128), np.uint8)
    cv2.circle(img, (40, 64), 30, 200, -1)            # solid breast blob
    cv2.circle(img, (100, 30), 12, 220, 3)            # ring artifact
    ref_mask = ref_preprocessor.select_largest_obj(
        (img > 10).astype(np.uint8) * 255, lab_val=255, fill_holes=True)
    ours = np.asarray(cleaner.select_largest_obj(
        jnp.asarray((img > 10).astype(np.uint8) * 255), 255, fill_holes_=True))
    np.testing.assert_array_equal(ours > 0, ref_mask > 0)
    assert not ours[30, 100]  # ring interior NOT in the mask


def test_segment_selects_by_filled_area(ref_preprocessor):
    """Largest-contour selection uses FILLED area like cv2.contourArea:
    a hollow ring with a big interior beats a smaller solid blob."""
    img = np.zeros((128, 128), np.uint8)
    cv2.circle(img, (40, 64), 22, 180, -1)            # solid blob (~1500 px)
    cv2.circle(img, (95, 64), 30, 180, 4)             # ring, filled area ~2800
    ref_img, ref_rect = ref_preprocessor.segment_breast(img, low_int_threshold=0.05,
                                                        crop=False)
    ours_img, ours_rect = cleaner.segment_breast_mask(jnp.asarray(img), 0.05)
    assert tuple(int(v) for v in ours_rect) == tuple(ref_rect)
    assert _iou(np.asarray(ours_img) > 0, ref_img > 0) > 0.98


def test_process_pect_removal_return_and_blur_param(mammo):
    """process(pect_removal=True) returns the pectoral-removed image even
    with artif_suppression=False, and blur_kn_size is honored."""
    out, res = cleaner.process(jnp.asarray(mammo), median_filtering=True,
                               blur_kn_size=5, artif_suppression=False,
                               pect_removal=True)
    assert res is not None
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(res.img_breast_only))


def test_median_blur5_matches_cv2(rng):
    from cadx_tpu.ops.morphology import median_blur

    img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(median_blur(jnp.asarray(img), 5)), cv2.medianBlur(img, 5))


def test_pectoral_corpus_floor(ref_preprocessor):
    """Corpus-level pectoral parity (round-5 verdict #6): the watershed
    tie-break divergence is bounded across parametrized anatomy, not
    just the single fixture. tools/pectoral_corpus.py measured 80
    synthetic variants (perf_history/pectoral_corpus.json): IoU min
    0.9308, p05 0.9434, median 0.9765, none below 0.90. This test
    re-runs the measured-WORST seeds plus a median one and pins the
    floor — a regression in the flood/ridge code shows up here first."""
    from synthetic_mammo import make_mammo

    # worst seeds from the 80-variant sweep + one median-ish seed
    cases = {28: 0.9308, 65: 0.9375, 47: 0.9393, 5: 0.9486, 3: 0.97}
    for seed, floor in cases.items():
        img = make_mammo(seed)
        sup, mask = ref_preprocessor.suppress_artifacts(
            img, global_threshold=0.05, fill_holes=True,
            smooth_boundary=True)
        seg, _ = ref_preprocessor.segment_breast(
            sup, low_int_threshold=0.05, crop=False)
        ref_breast, _ = ref_preprocessor.remove_pectoral(
            seg, mask, high_int_threshold=0.8, morph_kn_size=3,
            n_morph_op=7, sm_kn_size=25)
        assert (ref_breast > 0).sum() > 500, f"oracle degenerate seed {seed}"
        res = cleaner.remove_pectoral(jnp.asarray(seg), jnp.asarray(mask),
                                      0.8, 3, 7, 25)
        iou = _iou(res.breast_only_mask, ref_breast > 0)
        # measured value minus a hair of slack for cross-platform float
        # differences in the equalize/threshold tables
        assert iou > floor - 0.005, (seed, iou)
