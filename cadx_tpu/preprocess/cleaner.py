"""On-device mammogram cleaning: the reference DMImagePreprocessor
(WebApplicationPrototype/customImageCleaner.py) re-built as fused,
jittable TPU transforms.

Three stages, same contracts as the reference:
- suppress_artifacts (customImageCleaner.py:93-105): relative threshold,
  largest connected object with flood-fill hole adding + morphological
  opening, mask AND.
- segment_breast (:107-123): 8-bit rescale, threshold, largest contour
  filled (== largest component with holes filled) + bounding rect.
- remove_pectoral (:125-157): hist-equalize, high threshold, largest
  object, eroded/dilated marker bands, watershed, red ridge paint,
  breast-only mask opening.

plus process() (:159-176) and the app's full single-image path
(app.py:96-150) ending in a 512x512 grayscale ready for the U-Net
encoder. Everything static-shape; each stage jits into one XLA program
(irregular CPU algorithms are replaced by the scan/relaxation ops in
cadx_tpu.ops — tolerance-tested against OpenCV).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cadx_tpu.ops.components import fill_holes, largest_component
from cadx_tpu.ops.histogram import equalize_hist
from cadx_tpu.ops.morphology import dilate, erode, median_blur, opening
from cadx_tpu.ops.resize import resize_area
from cadx_tpu.ops.threshold import binary_threshold, max_pix_val, relative_threshold_value, to_uint8
from cadx_tpu.ops.watershed import marker_watershed


def select_largest_obj(img_bin: jax.Array, lab_val: int = 255,
                       fill_holes_: bool = False,
                       smooth_boundary: bool = False,
                       kernel_size: int = 15) -> jax.Array:
    """Largest 8-connected object, optional hole filling + open smoothing.

    Reference semantics (customImageCleaner.py:60-82): the flood fill runs
    on largest_mask (all OTHER objects already zeroed), so the holes added
    are the enclosed background of the LARGEST object only — interiors of
    ring-shaped artifacts elsewhere in frame stay background. Output dtype
    follows lab_val's magnitude (uint16 masks for uint16 images).
    """
    from cadx_tpu.ops.components import _use_pallas

    fg = img_bin > 0
    h, w = fg.shape
    out_dtype = jnp.uint8 if lab_val <= 255 else jnp.uint16
    if _use_pallas(h, w) and not (h & (h - 1)) and not (w & (w - 1)):
        # one fused VMEM program for CCL+mode+fill+opening: per-image
        # kernel-launch overhead (~35us each) dominates the separate
        # calls; bit-identical phases (kernels/largest_obj.py)
        from cadx_tpu.kernels.largest_obj import largest_obj_pallas

        mask = largest_obj_pallas(
            fg[None], 8, fill=fill_holes_,
            smooth_k=kernel_size if smooth_boundary else 0)[0]
        return jnp.where(mask, jnp.asarray(lab_val, out_dtype),
                         jnp.asarray(0, out_dtype))
    largest = largest_component(fg, connectivity=8)
    mask = fill_holes(largest) if fill_holes_ else largest
    out = jnp.where(mask, jnp.asarray(lab_val, out_dtype), jnp.asarray(0, out_dtype))
    if smooth_boundary:
        out = opening(out, kernel_size)
    return out


def _bounding_rect(mask: jax.Array):
    """(x, y, w, h) of the True region — cv2.boundingRect equivalent."""
    h, w = mask.shape
    rows = mask.any(axis=1)
    cols = mask.any(axis=0)
    y0 = jnp.argmax(rows)
    y1 = h - jnp.argmax(rows[::-1])
    x0 = jnp.argmax(cols)
    x1 = w - jnp.argmax(cols[::-1])
    any_ = mask.any()
    return (
        jnp.where(any_, x0, 0),
        jnp.where(any_, y0, 0),
        jnp.where(any_, x1 - x0, 0),
        jnp.where(any_, y1 - y0, 0),
    )


@functools.partial(jax.jit, static_argnames=("global_threshold", "kernel_size"))
def suppress_artifacts(img: jax.Array, global_threshold: float = 0.05,
                       kernel_size: int = 15):
    """Stage 1: keep the breast (largest bright object), zero the rest.

    img: (H, W) uint8 or uint16. Returns (img_suppressed, breast_mask)
    with the mask at the dtype's max value like the reference's
    max_pix_val (a uint8 255-mask would AND away a uint16 image's high
    byte).
    """
    maxval = max_pix_val(img.dtype)
    low_th = relative_threshold_value(img, global_threshold)
    img_bin = binary_threshold(img, low_th, maxval)
    breast_mask = select_largest_obj(img_bin, maxval, fill_holes_=True,
                                     smooth_boundary=True,
                                     kernel_size=kernel_size)
    img_suppr = img & breast_mask  # bitwise AND like cv2.bitwise_and
    return img_suppr, breast_mask


@functools.partial(jax.jit, static_argnames=("low_int_threshold",))
def segment_breast_mask(img: jax.Array, low_int_threshold: float = 0.05):
    """Stage 2 (crop=False form, as the app calls it, app.py:117-121).

    Returns (img_breast_only, (x, y, w, h)). Largest contour filled ==
    largest component with its holes filled.
    """
    img_8u = to_uint8(img)
    low_th = relative_threshold_value(img_8u, low_int_threshold)
    img_bin = binary_threshold(img_8u, low_th, 255)
    # cv2 selects by argmax(contourArea) — the FILLED polygon area, not the
    # pixel count — then drawContours(-1) paints everything inside the
    # outer contour. Labeling the hole-filled mask gives exactly those
    # filled regions, so argmax over them matches cv2's criterion (a
    # hollow ring ranks by its filled interior).
    from cadx_tpu.ops.components import _use_pallas

    hh, ww = img_bin.shape
    if _use_pallas(hh, ww) and not (hh & (hh - 1)) and not (ww & (ww - 1)):
        from cadx_tpu.kernels.largest_obj import largest_obj_pallas

        contour_fill = largest_obj_pallas(
            (img_bin > 0)[None], 8, fill_first=True)[0]
    else:
        filled = fill_holes(img_bin > 0)
        contour_fill = largest_component(filled, connectivity=8)
    img_breast_only = jnp.where(contour_fill, img, jnp.asarray(0, img.dtype))
    return img_breast_only, _bounding_rect(contour_fill)


class PectoralResult(NamedTuple):
    img_breast_only: jax.Array   # equalized image masked to breast tissue
    img_equ: jax.Array           # equalized grayscale
    boundary: jax.Array          # watershed ridge (cv2's -1 pixels)
    breast_only_mask: jax.Array  # uint8 mask after opening


@functools.partial(jax.jit, static_argnames=("high_int_threshold", "morph_kn_size", "n_morph_op", "sm_kn_size"))
def remove_pectoral(img: jax.Array, breast_mask: jax.Array,
                    high_int_threshold: float = 0.8,
                    morph_kn_size: int = 3, n_morph_op: int = 7,
                    sm_kn_size: int = 25) -> PectoralResult:
    """Stage 3: split pectoral muscle from breast tissue via watershed.

    Marker layout mirrors the reference exactly (customImageCleaner.py:
    132-141): 255 = eroded pectoral core, 128 = outside the dilated
    pectoral (breast), 64 = outside the breast mask, 0 = the uncertain
    band the watershed resolves.
    """
    from cadx_tpu.ops.components import _use_pallas

    maxval = max_pix_val(img.dtype)
    img_equ = equalize_hist(img)
    high_th = relative_threshold_value(img, high_int_threshold)
    img_bin = binary_threshold(img_equ, high_th, maxval)

    h, w = img.shape
    if (_use_pallas(h, w, planes=16) and not (h & (h - 1))
            and not (w & (w - 1))
            and (morph_kn_size % 2 == 1 or n_morph_op <= 1)):
        # one fused VMEM program for largest-object + marker bands +
        # watershed + boundary opening (kernels/pectoral.py; even
        # morph_kn_size with repeats anchors differently there, so those
        # configs take the composed path below) — the
        # separate launches' per-image overhead dominates their compute;
        # bit-identical phases
        from cadx_tpu.kernels.pectoral import pectoral_tail_pallas

        labels, boundary, mask_b = pectoral_tail_pallas(
            img_equ[None], img_bin[None], breast_mask[None],
            morph_kn_size, n_morph_op, sm_kn_size)
        boundary = boundary[0]
        breast_only_mask = jnp.where(mask_b[0], jnp.uint8(255), jnp.uint8(0))
        img_breast_only = img_equ & breast_only_mask
        return PectoralResult(img_breast_only, img_equ, boundary,
                              breast_only_mask)

    pect_mask_init = select_largest_obj(img_bin, maxval, fill_holes_=True,
                                        smooth_boundary=False)
    pect_eroded = erode(pect_mask_init, morph_kn_size, n_morph_op)
    pect_dilated = dilate(pect_mask_init, morph_kn_size, n_morph_op)

    markers = jnp.zeros(img.shape, jnp.int32)
    markers = jnp.where(pect_eroded > 0, 255, markers)
    markers = jnp.where(pect_dilated == 0, 128, markers)
    markers = jnp.where(breast_mask == 0, 64, markers)

    # max_scan=8: the unlabeled band between the eroded/dilated markers
    # is ~2*n_morph_op*kn wide, so capped scan windows converge in the
    # same few sweeps at less roll work; the fixpoint (and thus the
    # result) is exact regardless of the cap (ops/watershed.py). r5
    # on-chip A/B over the 8/16/32/64 grid: bit-identical, 8 fastest.
    labels, boundary = marker_watershed(img_equ, markers, max_scan=8,
                                        marker_label_values=(255, 128, 64))

    breast_only = jnp.where(boundary, 0, labels)
    breast_only_mask = jnp.where(breast_only == 128, jnp.uint8(255), jnp.uint8(0))
    breast_only_mask = opening(breast_only_mask, sm_kn_size)
    img_breast_only = img_equ & breast_only_mask
    return PectoralResult(img_breast_only, img_equ, boundary, breast_only_mask)


def process(img: jax.Array, median_filtering: bool = True,
            blur_kn_size: int = 3, artif_suppression: bool = True,
            low_int_threshold: float = 0.05, kernel_size: int = 15,
            pect_removal: bool = False, high_int_threshold: float = 0.8,
            **pect_kwargs):
    """Reference `DMImagePreprocessor.process` orchestration (:159-176):
    optional median blur (blur_kn_size), artifact suppression, and — when
    pect_removal — the pectoral-removal result ALWAYS becomes the primary
    image (the reference overwrites img_proc unconditionally at :172)."""
    img_proc = img
    if median_filtering:
        img_proc = median_blur(img_proc, blur_kn_size)
    if artif_suppression:
        img_proc, mask_ = suppress_artifacts(
            img_proc, global_threshold=low_int_threshold,
            kernel_size=kernel_size)
    else:
        # reference else-branch calls suppress_artifacts with DEFAULTS
        # just to get the mask (customImageCleaner.py:170) — caller
        # thresholds must not leak into it
        _, mask_ = suppress_artifacts(img_proc)
    if pect_removal:
        res = remove_pectoral(img_proc, mask_,
                              high_int_threshold=high_int_threshold,
                              **pect_kwargs)
        return res.img_breast_only, res
    return img_proc, None


def boundary_image_gray(res: PectoralResult) -> jax.Array:
    """The app's `img_with_boundary` -> grayscale step (app.py:136-141).

    The reference paints the ridge red on the BGR equalized image then
    converts BGR->GRAY; red contributes weight 0.299.
    """
    g = res.img_equ.astype(jnp.float32)
    return jnp.where(res.boundary, 0.299 * 255.0, g)


def clean_boundary_gray(img: jax.Array) -> jax.Array:
    """The app's cleaning chain at native resolution (app.py:96-135):
    uint8 rescale -> suppress_artifacts(0.05, 15) ->
    segment_breast(crop=False, 0.05) -> remove_pectoral(0.8, 3, 7, 25) ->
    boundary-painted grayscale in [0, 255] float32. Shared by
    clean_for_unet, the serving engine, and the fused pipeline.

    Perf-gate note (r3): kernels/cleaner_front.py fuses this whole front
    (suppress+segment) into ONE VMEM program, bit-identical
    (test_kernels.py::test_fused_cleaner_front_matches_composition), but
    measured a 1.3ms/96-batch LOSS in-program (26.12 vs 24.78 ms pass):
    with the mode sort skipped, the two separate largest_obj programs
    let XLA overlap their glue with neighbouring images' kernels, which
    the bigger fused program prevents. Kept as a parity-tested
    alternative per the SURVEY gate policy; the composed path below is
    the production dispatch."""
    raw8 = to_uint8(img)
    img_suppr, breast_mask = suppress_artifacts(raw8, 0.05, 15)
    img_breast_only, _ = segment_breast_mask(img_suppr, 0.05)
    res = remove_pectoral(img_breast_only.astype(jnp.uint8), breast_mask,
                          0.8, 3, 7, 25)
    return boundary_image_gray(res)


@jax.jit
def clean_for_unet(img: jax.Array) -> jax.Array:
    """Full app preprocessing path (app.py:96-144), one XLA program:
    cleaning chain -> 512x512 INTER_AREA resize -> [0,1] grayscale ready
    for the U-Net encoder."""
    return resize_area(clean_boundary_gray(img), (512, 512)) / 255.0
