"""Pallas kernel parity tests (interpret mode on CPU; compiled on TPU).

Each kernel must be bit-identical to its XLA reference implementation in
cadx_tpu.ops — the SURVEY build-plan's "Pallas kernels swapped in behind
the lax reference" gate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadx_tpu.kernels.ccl import label_components_pallas
from cadx_tpu.kernels.flood import flood_from_pallas
from cadx_tpu.kernels.watershed_kernel import marker_watershed_pallas
from cadx_tpu.ops import components as C
from cadx_tpu.ops import watershed as W

INTERPRET = jax.default_backend() != "tpu"


@pytest.fixture
def masks(rng):
    m = rng.random((2, 128, 128)) > 0.55
    m[0, :3, :] = False
    return jnp.asarray(m)


def test_ccl_kernel_matches_xla(masks):
    for conn in (8, 4):
        ref = jax.vmap(lambda x: C._label_core(x, conn, 128))(masks)
        ours = label_components_pallas(masks, conn, interpret=INTERPRET)
        m = np.asarray(masks)
        np.testing.assert_array_equal(np.asarray(ref)[m], np.asarray(ours)[m])


def test_flood_kernel_matches_xla(masks):
    h, w = 128, 128
    border = np.zeros((h, w), bool)
    border[0, :] = border[-1, :] = True
    border[:, 0] = border[:, -1] = True
    seeds = jnp.asarray(np.broadcast_to(border, (2, h, w))) & masks
    ours = flood_from_pallas(masks, seeds, interpret=INTERPRET)
    import os

    os.environ["CADX_DISABLE_PALLAS"] = "1"
    try:
        ref = jax.vmap(lambda m, s: C.flood_from(m, s))(masks, seeds)
    finally:
        del os.environ["CADX_DISABLE_PALLAS"]
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(ours))


@pytest.mark.slow
def test_mode_kernel_matches_xla(masks, rng):
    """Bitonic-sort largest-component mask == XLA sort + _mode_label,
    including area ties (smallest-label tie-break) and empty masks."""
    from cadx_tpu.kernels.mode import largest_component_mask_pallas

    extra = np.zeros((2, 128, 128), bool)
    extra[0, 10:20, 10:20] = True     # 100 px
    extra[0, 60:70, 60:70] = True     # 100 px tie
    # sub-majority largest (the pectoral-stage shape where the old
    # half-total proof never fired): largest ~30% + several mid blobs
    # + speckle; and pure speckle (probe proof must fall back to sort)
    submaj = np.zeros((2, 128, 128), bool)
    yy, xx = np.mgrid[0:128, 0:128]
    submaj[0] |= ((yy - 30) ** 2 + (xx - 30) ** 2) < 700
    submaj[0] |= ((yy - 90) ** 2 + (xx - 90) ** 2) < 350
    submaj[0] |= ((yy - 30) ** 2 + (xx - 100) ** 2) < 200
    submaj[0, 100:104, 5:125:7] = True                  # speckle stripes
    submaj[1] = (np.asarray(rng.random((128, 128))) < 0.08)  # pure speckle
    cases = [np.asarray(masks), extra, submaj]
    for case in cases:
        m = jnp.asarray(case)
        labels = jax.vmap(lambda x: C._label_core(x, 8, 128))(m)
        ref = jax.vmap(lambda l, mm: mm & (l == C._mode_label(l, mm)))(labels, m)
        ours = largest_component_mask_pallas(labels, m, interpret=INTERPRET)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(ours))


def test_row_runlen_exact(rng):
    """kernels.mode._row_runlen == the true per-pixel horizontal run
    length, including runs touching column 0 and runs preceded by a
    barrier (the inclusive-cumsum segment puts the left barrier in the
    run's segment — an early version over-counted those by one)."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from cadx_tpu.kernels.mode import _row_runlen

    m = np.asarray(rng.random((64, 128)) < 0.45)
    m[0, :] = True            # full row
    m[1, :] = False           # empty row
    m[2, 1:4] = True; m[2, 0] = False   # run preceded by a barrier

    def _kern(mask_ref, out_ref):
        out_ref[0] = _row_runlen(mask_ref[0] != 0)

    spec = pl.BlockSpec((1,) + m.shape, lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    got = np.asarray(pl.pallas_call(
        _kern, out_shape=jax.ShapeDtypeStruct((1,) + m.shape, jnp.int32),
        grid=(1,), in_specs=[spec], out_specs=spec, interpret=INTERPRET,
    )(jnp.asarray(m)[None].astype(jnp.int32))[0])
    ref = np.zeros_like(got)
    for r in range(m.shape[0]):
        c = 0
        while c < m.shape[1]:
            if m[r, c]:
                e = c
                while e + 1 < m.shape[1] and m[r, e + 1]:
                    e += 1
                ref[r, c:e + 1] = e - c + 1
                c = e + 1
            else:
                c += 1
    np.testing.assert_array_equal(got, ref)


@pytest.mark.slow
def test_fused_largest_obj_matches_composition(masks, rng):
    """The fused CCL+mode+fill+opening kernel == composing the separate
    ops, for both phase orderings and both smoothing kernels."""
    from cadx_tpu.kernels.largest_obj import largest_obj_pallas
    from cadx_tpu.ops.morphology import opening as xla_opening

    hw = 128
    ring = np.zeros((hw, hw), bool)
    yy, xx = np.mgrid[0:hw, 0:hw]
    ring |= np.abs(((yy - 64) ** 2 + (xx - 64) ** 2) ** 0.5 - 30) < 5
    blob = ((yy - 64) ** 2 + (xx - 120) ** 2) < 3000
    blob[40:50, 100:110] = False  # a hole
    # cert-firing (single-run rows) ellipse and an adversarial "U"
    # (single-run columns, multi-run rows, concave but hole-free):
    # the fill phase's no-holes certificate must not change results
    ellipse = ((yy - 64) / 40.0) ** 2 + ((xx - 60) / 28.0) ** 2 <= 1
    ushape = np.zeros((hw, hw), bool)
    ushape[30:90, 30:42] = ushape[30:90, 80:92] = ushape[30:42, 30:92] = True
    cases = [np.asarray(masks[0]), ring, blob, ellipse, ushape,
             np.zeros((hw, hw), bool)]
    for m in cases:
        mj = jnp.asarray(m)
        largest = C.largest_component(mj, 8)
        ref_fill = C.fill_holes(largest)
        ref_smooth = np.asarray(xla_opening(
            jnp.asarray(np.asarray(ref_fill).astype(np.uint8) * 255), 15)) > 0
        ref_ff = C.largest_component(C.fill_holes(mj), 8)
        np.testing.assert_array_equal(
            np.asarray(ref_fill),
            np.asarray(largest_obj_pallas(mj[None], 8, fill=True,
                                          interpret=INTERPRET))[0])
        np.testing.assert_array_equal(
            ref_smooth,
            np.asarray(largest_obj_pallas(mj[None], 8, fill=True, smooth_k=15,
                                          interpret=INTERPRET))[0])
        np.testing.assert_array_equal(
            np.asarray(ref_ff),
            np.asarray(largest_obj_pallas(mj[None], 8, fill_first=True,
                                          interpret=INTERPRET))[0])


@pytest.mark.slow
def test_flood_largest_component_alternative(masks, rng):
    """The perf-gated-OFF flood-probe largest-component alternative
    (kernels/largest_obj.py::largest_component_mask) stays bit-identical
    to the production CCL+mode selection — both on majority masks (fast
    flood path) and on adversarial ones (sort fallback)."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from cadx_tpu.kernels import largest_obj as L

    hw = 128
    yy, xx = np.mgrid[0:hw, 0:hw]
    blob = ((yy - 64) ** 2 + (xx - 96) ** 2) < 2500       # clear majority
    blob[20:26, 10:16] = True                             # small extra
    tie = np.zeros((hw, hw), bool)
    tie[10:20, 10:20] = True
    tie[60:70, 60:70] = True                              # exact tie: slow path
    cases = [blob, tie, np.asarray(masks[0]), np.zeros((hw, hw), bool)]

    def _alt_kernel(mask_ref, out_ref, *, lbl_bits):
        m = mask_ref[0] != 0
        rs, cs = L._segs(m)
        out = L.largest_component_mask(m, rs, cs, lbl_bits=lbl_bits,
                                       connectivity=8, max_iters=128)
        out_ref[0] = out.astype(jnp.int32)

    import numpy as _np

    for m in cases:
        lbl_bits = int(_np.ceil(_np.log2(hw * hw + 1)))
        spec = pl.BlockSpec((1, hw, hw), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
        got = pl.pallas_call(
            functools.partial(_alt_kernel, lbl_bits=lbl_bits),
            out_shape=jax.ShapeDtypeStruct((1, hw, hw), jnp.int32),
            grid=(1,), in_specs=[spec], out_specs=spec,
            interpret=INTERPRET,
        )(jnp.asarray(m)[None].astype(jnp.int32))
        mj = jnp.asarray(m)
        ref = mj & (C._label_core(mj, 8, 128) == C._mode_label(
            C._label_core(mj, 8, 128), mj))
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got[0]) == 1)


@pytest.mark.slow
def test_fused_cleaner_front_matches_composition(rng):
    """The fused suppress+segment front kernel == composing
    suppress_artifacts + segment_breast_mask (XLA path), bit-identical,
    on a synthetic mammogram and on adversarial masks."""
    import os

    from cadx_tpu.kernels.cleaner_front import cleaner_front_pallas
    from cadx_tpu.preprocess import cleaner

    hw = 128
    yy, xx = np.mgrid[0:hw, 0:hw]
    img = np.zeros((hw, hw), np.uint8)
    breast = ((xx - hw + 1) ** 2 + (yy - hw // 2) ** 2) < (hw // 2) ** 2
    tissue = (110 + rng.normal(0, 25, (hw, hw))).clip(40, 185).astype(np.uint8)
    img[breast] = tissue[breast]
    img[10:16, 4:10] = 255  # isolated artifact to suppress
    noise = (rng.random((hw, hw)) * 255).astype(np.uint8)  # pathological
    dark = np.zeros((hw, hw), np.uint8)                    # empty masks
    for case in (img, noise, dark):
        raw8 = jnp.asarray(case)
        os.environ["CADX_DISABLE_PALLAS"] = "1"
        try:
            s_img, bm = cleaner.suppress_artifacts(raw8, 0.05, 15)
            bo, rect = cleaner.segment_breast_mask(s_img, 0.05)
        finally:
            del os.environ["CADX_DISABLE_PALLAS"]
        breast_only, mask1, contour = cleaner_front_pallas(
            raw8[None], interpret=INTERPRET)
        np.testing.assert_array_equal(np.asarray(bo).astype(np.int32),
                                      np.asarray(breast_only[0]))
        np.testing.assert_array_equal(np.asarray(bm) > 0, np.asarray(mask1[0]))
        # contour mask reproduces the same bounding rect
        ref_rect = tuple(int(v) for v in rect)
        got_rect = tuple(int(v) for v in cleaner._bounding_rect(contour[0]))
        assert ref_rect == got_rect


def test_clean_boundary_gray_fused_path_matches_composed(rng):
    """clean_boundary_gray's fused-front dispatch == the composed-stage
    path (the full-chain contract the serving engine and fused pipeline
    ride)."""
    import os

    from cadx_tpu.preprocess import cleaner

    hw = 128
    yy, xx = np.mgrid[0:hw, 0:hw]
    img = np.zeros((hw, hw), np.uint8)
    breast = ((xx - hw + 1) ** 2 + (yy - hw // 2) ** 2) < (hw // 2) ** 2
    tissue = (110 + rng.normal(0, 25, (hw, hw))).clip(40, 185).astype(np.uint8)
    img[breast] = tissue[breast]
    wedge = ((hw - 1 - xx) + yy) < hw // 3
    img[wedge] = np.maximum(img[wedge], 235)

    raw = jnp.asarray(img)
    fused_out = np.asarray(cleaner.clean_boundary_gray(raw))
    os.environ["CADX_DISABLE_PALLAS"] = "1"
    try:
        ref_out = np.asarray(cleaner.clean_boundary_gray(raw))
    finally:
        del os.environ["CADX_DISABLE_PALLAS"]
    np.testing.assert_array_equal(ref_out, fused_out)


@pytest.mark.slow
def test_fused_pectoral_tail_matches_composition(rng):
    """The fused pectoral-tail kernel (largest-obj + marker bands +
    watershed + boundary opening) == the composed XLA path."""
    import os

    from cadx_tpu.kernels.pectoral import pectoral_tail_pallas
    from cadx_tpu.ops.histogram import equalize_hist
    from cadx_tpu.ops.threshold import binary_threshold, relative_threshold_value
    from cadx_tpu.preprocess import cleaner

    hw = 128
    img = np.zeros((hw, hw), np.uint8)
    yy, xx = np.mgrid[0:hw, 0:hw]
    breast = ((xx - hw + 1) ** 2 + (yy - hw // 2) ** 2) < (hw // 2) ** 2
    tissue = (110 + rng.normal(0, 25, (hw, hw))).clip(40, 185).astype(np.uint8)
    img[breast] = tissue[breast]
    wedge = ((hw - 1 - xx) + yy) < hw // 3
    img[wedge] = np.maximum(img[wedge], 235)

    raw8 = jnp.asarray(img)
    s_img, bm = cleaner.suppress_artifacts(raw8, 0.05, 15)
    bo8 = cleaner.segment_breast_mask(s_img, 0.05)[0].astype(jnp.uint8)

    os.environ["CADX_DISABLE_PALLAS"] = "1"
    try:
        res = cleaner.remove_pectoral(bo8, bm, 0.8, 3, 7, 25)
    finally:
        del os.environ["CADX_DISABLE_PALLAS"]

    img_equ = equalize_hist(bo8)
    img_bin = binary_threshold(img_equ, relative_threshold_value(bo8, 0.8), 255)
    labels, boundary, mask_b = pectoral_tail_pallas(
        img_equ[None], img_bin[None], bm[None], 3, 7, 25, interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(res.boundary), np.asarray(boundary[0]))
    np.testing.assert_array_equal(
        np.asarray(res.breast_only_mask),
        np.where(np.asarray(mask_b[0]), 255, 0).astype(np.uint8))


def test_watershed_kernel_matches_xla(rng):
    h = w = 128
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.where((xx + yy) < 96, 230.0, 90.0)
    markers = np.zeros((h, w), np.int32)
    markers[(xx + yy) < 48] = 1
    markers[(xx + yy) > 160] = 2
    imgs = jnp.asarray(img)[None]
    mks = jnp.asarray(markers)[None]

    labels_p, boundary_p = marker_watershed_pallas(imgs, mks, interpret=INTERPRET)

    import os

    os.environ["CADX_DISABLE_PALLAS"] = "1"
    try:
        labels_x, boundary_x = W.marker_watershed(jnp.asarray(img), jnp.asarray(markers))
    finally:
        del os.environ["CADX_DISABLE_PALLAS"]
    np.testing.assert_array_equal(np.asarray(labels_p)[0], np.asarray(labels_x))
    np.testing.assert_array_equal(np.asarray(boundary_p)[0], np.asarray(boundary_x))


def test_dispatch_respects_backend():
    """On CPU the ops must NOT route into compiled Pallas kernels."""
    m = jnp.asarray(np.random.default_rng(0).random((128, 128)) > 0.5)
    out = C.label_components(m)  # would raise if it tried compiled pallas on cpu
    assert out.shape == (128, 128)


def test_conv2d_leaky_pallas_matches_lax(rng):
    from cadx_tpu.kernels import nn_kernels as nk
    from cadx_tpu.ops.conv import conv2d_leaky

    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 4)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(4) * 0.1, jnp.float32)
    ref = conv2d_leaky(x, w, b, alpha=0.01, padding="VALID")
    ours = nk.conv2d_leaky_pallas(x, w, b, 0.01, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_pool_upsample_bn_pallas_match_ops(rng):
    from cadx_tpu.kernels import nn_kernels as nk
    from cadx_tpu.models.unet import _bn_apply, _bn_params
    from cadx_tpu.ops.pool import avg_pool, max_pool_ties, upsample_nearest

    x = jnp.asarray(rng.standard_normal((2, 12, 12, 8)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(nk.max_pool_pallas(x, 2, interpret=INTERPRET)),
        np.asarray(max_pool_ties(x, 2)))
    np.testing.assert_allclose(
        np.asarray(nk.avg_pool_pallas(x, 3, interpret=INTERPRET)),
        np.asarray(avg_pool(x, 3)), atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(nk.upsample_nearest_pallas(x, 2, interpret=INTERPRET)),
        np.asarray(upsample_nearest(x, 2)))

    p = _bn_params(8)
    p = {k: jnp.asarray(rng.standard_normal(8) * 0.3 + (1 if k in ("scale", "var") else 0),
                        jnp.float32) for k in p}
    p["var"] = jnp.abs(p["var"]) + 0.5
    ref = _bn_apply(p, x)
    ours = nk.batchnorm_pallas(x, p["scale"], p["bias"], p["mean"], p["var"],
                               interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_gradcam_tail_pallas_matches_pipeline(rng):
    """The fused tail kernel == the pipeline's XLA gradcam tail."""
    from cadx_tpu.kernels import nn_kernels as nk
    from cadx_tpu.ops.colormap import apply_jet
    from cadx_tpu.ops.resize import resize_linear

    acts = jnp.asarray(np.abs(rng.standard_normal((2, 8, 8, 4))), jnp.float32)
    grads = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    img01 = jnp.asarray(rng.random((2, 32, 32)), jnp.float32)

    ov, heat = nk.gradcam_tail_pallas(acts, grads, img01, (32, 32),
                                      interpret=INTERPRET)

    # XLA reference (mirrors pipeline.fused._gradcam_tail math)
    wgt = grads.mean(axis=(1, 2), keepdims=True)
    cam = jax.nn.relu((wgt * acts).sum(-1))
    lo = cam.min(axis=(1, 2), keepdims=True)
    hi = cam.max(axis=(1, 2), keepdims=True)
    cam = (cam - lo) / (hi - lo + 1e-7)
    cam_up = jax.vmap(lambda c: resize_linear(c, (32, 32)))(cam)
    heat_ref = (jnp.clip(cam_up, 0, 1) * 255).astype(jnp.uint8)
    # rounding vs truncation at the uint8 edge differs by at most 1
    assert np.abs(np.asarray(heat).astype(int)
                  - np.asarray(heat_ref).astype(int)).max() <= 1

    jet_rgb = (apply_jet(heat) .astype(jnp.float32) / 255.0)[..., ::-1]
    img3 = jnp.repeat(img01[..., None], 3, axis=-1)
    over = jet_rgb + img3
    over = over / jnp.maximum(over.max(axis=(1, 2, 3), keepdims=True), 1e-7)
    ov_ref = (over * 255).astype(jnp.uint8)
    assert np.abs(np.asarray(ov).astype(int)
                  - np.asarray(ov_ref).astype(int)).max() <= 2


def test_equalize_pallas_matches_cv2(rng):
    import cv2

    from cadx_tpu.kernels.equalize import equalize_hist_pallas

    imgs = rng.integers(0, 200, (3, 64, 64), dtype=np.uint8)
    ours = np.asarray(equalize_hist_pallas(jnp.asarray(imgs), interpret=INTERPRET))
    ref = np.stack([cv2.equalizeHist(imgs[i]) for i in range(3)])
    np.testing.assert_array_equal(ours, ref)
