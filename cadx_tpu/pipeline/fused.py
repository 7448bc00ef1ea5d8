"""The fused end-to-end CADx pipeline: one jit program per batch.

Reference flow (app.py /upload-single + /classify): raw mammogram ->
DMImagePreprocessor cleaning -> U-Net encoder first-layer features ->
bottleneck resize (32,32) -> CNN classify -> Grad-CAM overlays per class.
In the reference this spans OpenCV, two torch models, matplotlib threads
and disk roundtrips; here the entire path is a single batched XLA program
on TPU (the BASELINE.json north-star artifact, benchmarked by bench.py at
256x256).

Stages (all on device):
1. clean: uint8 rescale -> artifact suppression -> breast segmentation ->
   pectoral removal (watershed) -> boundary-gray display image, [0,1].
2. segment: resnet-style conv1 (7x7/2, 64ch) -> (H/2, W/2, 64) features
   (the app's "segmentation masks", app.py:148).
3. classify: bilinear feature resize to the classifier's input (the app's
   process_bottleneck_features, app.py:466-489) -> CNN -> guarded softmax.
4. explain: Grad-CAM per requested class -> upsample -> JET -> blend onto
   the cleaned display image.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cadx_tpu.models import cnn, unet
from cadx_tpu.ops.colormap import apply_jet
from cadx_tpu.ops.resize import resize_linear, resize_linear_mxu
from cadx_tpu.preprocess import cleaner


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    image_hw: tuple[int, int] = (256, 256)
    feature_hw: tuple[int, int] = (32, 32)      # classifier spatial input
    classes_to_explain: tuple[int, ...] = (0, 1)
    # HBM storage dtype for the encoder's (B, H/2, W/2, 64) feature maps —
    # the pipeline's single biggest intermediate (402MB f32 at 96x256^2).
    # "bfloat16" fuses the down-cast into the conv epilogue and the up-cast
    # into the resize gather: 1.2ms/96-batch measured win; probabilities
    # drift O(1e-3), far inside the reference-composed tolerance (0.05).
    # OPT-IN like every other bf16 path (bench/serving set it); the
    # default stays bit-exact f32 (round-3 advisor finding).
    feature_dtype: str = "float32"
    classifier: cnn.CNNConfig = dataclasses.field(
        default_factory=lambda: cnn.CNNConfig(
            input_shape=(32, 32, 64),
            num_classes=2,
            conv_layers=((128, 3), (64, 3)),
            hidden_units=(256, 128),
            dropout_rate=0.3,
        )
    )


class PipelineParams(NamedTuple):
    encoder: dict   # resnet-style encoder (conv1 used for features)
    classifier: dict


def init_pipeline_params(rng: jax.Array, config: PipelineConfig) -> PipelineParams:
    k1, k2 = jax.random.split(rng)
    return PipelineParams(
        encoder=unet.init_resnet_encoder(k1),
        classifier=cnn.init_params(k2, config.classifier),
    )


class PipelineOutput(NamedTuple):
    probs: jax.Array          # (B, num_classes)
    predicted: jax.Array      # (B,) argmax class
    clean_u8: jax.Array       # (B, H, W) cleaned display image
    features: jax.Array       # (B, fh, fw, 64) classifier inputs
    overlays: jax.Array       # (B, n_classes_explained, H, W, 3) uint8 RGB
    heatmaps: jax.Array       # (B, n_classes_explained, H, W) uint8


def _clean_one(img_u8: jax.Array) -> jax.Array:
    """Cleaner chain at native resolution -> [0,1] float display image."""
    return cleaner.clean_boundary_gray(img_u8) / 255.0


def _resize_feats_mxu(feats: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """(B, H, W, C) bilinear resize via the two-matmul MXU form."""
    x = jnp.moveaxis(feats, -1, 1)                    # (B, C, H, W)
    out = resize_linear_mxu(x, out_hw)
    return jnp.moveaxis(out, 1, -1)


def _gradcam_tail(acts, vjp_fn, clean01, class_idx, config: PipelineConfig):
    """Batched CAM -> upsample -> jet -> show_cam_on_image blend.

    acts/vjp_fn are computed ONCE by the caller and reused per class —
    only the vjp seed differs between explained classes."""
    b = acts.shape[0]
    seed = jnp.zeros((b, config.classifier.num_classes)).at[:, class_idx].set(1.0)
    (grads,) = vjp_fn(seed)
    from cadx_tpu.xai.gradcam import cam_from_acts_grads

    cam = cam_from_acts_grads(acts, grads)                    # (B, h, w)

    # MXU matmul resize — jax.image.resize's gather form costs ~3ms/batch
    # here; same sample points, tolerance-contracted path
    cam_big = resize_linear_mxu(cam, config.image_hw)
    # clip-after-resize is DELIBERATE here: this tail explains the active
    # classifier (the framework's default CAM semantics), not the
    # reference's pytorch-grad-cam pipeline — only the gradcam_pth=
    # reference path (xai/gradcam.py::resnet_gradcam_overlay) applies
    # pytorch-grad-cam's second post-resize min-max renorm (PARITY.md
    # documents both divergences)
    heat_u8 = (jnp.clip(cam_big, 0.0, 1.0) * 255).astype(jnp.uint8)

    # Perf-gate note: kernels/overlay.py::jet_blend_pallas is a
    # bit-identical VMEM alternative for this jet+blend, ~2x faster
    # STANDALONE (8.4 -> ~4ms/class) but a net LOSS inside the fused
    # program (1868 vs 1895 img/s): the pallas_call is a fusion barrier
    # that forces heat/clean01/overlay through HBM, while XLA fuses the
    # one-hot jet into the surrounding elementwise ops here. XLA path
    # kept per the SURVEY gate policy.
    jet_rgb = (apply_jet(heat_u8).astype(jnp.float32) / 255.0)[..., ::-1]
    img_rgb = jnp.repeat(clean01[..., None], 3, axis=-1)
    over = jet_rgb + img_rgb
    over = over / jnp.maximum(over.max(axis=(1, 2, 3), keepdims=True), 1e-7)
    return (over * 255).astype(jnp.uint8), heat_u8


@functools.partial(jax.jit, static_argnames=("config",))
def run_pipeline(params: PipelineParams, batch_u8: jax.Array,
                 config: PipelineConfig) -> PipelineOutput:
    """batch_u8: (B, H, W) uint8/uint16 raw mammograms at config.image_hw."""
    clean01 = jax.vmap(_clean_one)(batch_u8)                  # (B, H, W)
    feats = unet.encoder_first_features(params.encoder, clean01[..., None])
    # store the big feature planes at config.feature_dtype (f32 default;
    # bench/serving opt into bf16) and return to f32 in-registers for the
    # resize
    feats = feats.astype(jnp.dtype(config.feature_dtype))
    # perf-gate note: the MXU matmul form (_resize_feats_mxu) measured
    # slightly WORSE here in-program twice (29.86 vs 29.65 and 25.39 vs
    # 24.82 ms/96-batch pass) — XLA fuses this gather well — so the
    # bit-parity gather form stays per the SURVEY gate policy
    feats_small = jax.vmap(
        lambda f: resize_linear(f.astype(jnp.float32), config.feature_hw))(feats)
    probs = cnn.forward(params.classifier, feats_small, config.classifier)
    predicted = jnp.argmax(probs, axis=-1)

    overlays, heatmaps = [], []
    if config.classes_to_explain:
        from cadx_tpu.xai.gradcam import conv_features, head_logits

        acts = conv_features(params.classifier, feats_small, config.classifier)
        _, vjp_fn = jax.vjp(
            lambda f: head_logits(params.classifier, f, config.classifier), acts)
        for class_idx in config.classes_to_explain:
            ov, hm = _gradcam_tail(acts, vjp_fn, clean01, class_idx, config)
            overlays.append(ov)
            heatmaps.append(hm)

    b = batch_u8.shape[0]
    h, w = config.image_hw
    return PipelineOutput(
        probs=probs,
        predicted=predicted,
        clean_u8=(clean01 * 255).astype(jnp.uint8),
        features=feats_small,
        overlays=(jnp.stack(overlays, axis=1) if overlays
                  else jnp.zeros((b, 0, h, w, 3), jnp.uint8)),
        heatmaps=(jnp.stack(heatmaps, axis=1) if heatmaps
                  else jnp.zeros((b, 0, h, w), jnp.uint8)),
    )


@functools.partial(jax.jit, static_argnames=("config",))
def run_pipeline_checksum(params: PipelineParams, batch_u8: jax.Array,
                          config: PipelineConfig) -> jax.Array:
    """Scalar digest of the full pipeline — benchmarking helper that
    forces end-to-end execution with minimal device->host traffic."""
    out = run_pipeline(params, batch_u8, config)
    return (
        out.probs.sum()
        + out.overlays.astype(jnp.float32).sum() / 1e6
        + out.features.sum() / 1e3
    )
