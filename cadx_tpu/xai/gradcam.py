"""Grad-CAM via jax.vjp on a split forward — no framework hooks.

The reference (WebApplicationPrototype/GRADCAM.py) hooks pytorch-grad-cam
into a pretrained ResNet50's layer4. TPU-native formulation: split the
classifier into features = conv_stack(x) and score = head(features),
get d(score_class)/d(features) with one vjp, then

    cam = relu( sum_k GAP(dscore/dA_k) * A_k )        (Grad-CAM)

normalized to [0,1], upsampled to the display size, and composed exactly
like pytorch-grad-cam's show_cam_on_image: overlay = (jet(cam)/255 +
img_float)/max * 255. The whole activation x gradient -> upsample ->
colormap -> blend tail is one fused XLA program.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from cadx_tpu.models import cnn
from cadx_tpu.ops.colormap import apply_jet
from cadx_tpu.ops.resize import resize_linear


# the SAME forward pieces predict() uses (models.cnn) — a CAM computed on
# a diverged re-implementation would explain a different network
conv_features = cnn.conv_stack
head_logits = cnn.head_logits


def cam_from_acts_grads(acts: jax.Array, grads: jax.Array) -> jax.Array:
    """THE Grad-CAM core, batched: weights = GAP(grads), cam =
    relu(sum_k w_k A_k), per-sample min-max to [0,1] (+1e-7 guard).
    (B,h,w,F) -> (B,h,w). Shared by gradcam_map, the fused pipeline tail
    and the micro-batcher so the parity-contracted semantics live once."""
    weights = grads.mean(axis=(1, 2), keepdims=True)      # GAP over spatial
    cam = jax.nn.relu((weights * acts).sum(axis=-1))      # (B, h, w)
    lo = cam.min(axis=(1, 2), keepdims=True)
    hi = cam.max(axis=(1, 2), keepdims=True)
    return (cam - lo) / (hi - lo + 1e-7)


@functools.partial(jax.jit, static_argnames=("config", "class_idx"))
def gradcam_map(params, x: jax.Array, class_idx: int,
                config: cnn.CNNConfig) -> jax.Array:
    """Normalized [0,1] CAM at feature resolution for one sample (H,W,C)."""
    acts = conv_features(params, x[None], config)
    _, vjp_fn = jax.vjp(lambda f: head_logits(params, f, config), acts)
    # d(score_class)/d(activations)
    seed = jnp.zeros((1, config.num_classes)).at[0, class_idx].set(1.0)
    (grads,) = vjp_fn(seed)
    return cam_from_acts_grads(acts, grads)[0]


@functools.partial(jax.jit, static_argnames=("config", "class_idx", "out_hw"))
def gradcam_overlay(params, x: jax.Array, display_img_u8: jax.Array,
                    class_idx: int, config: cnn.CNNConfig,
                    out_hw: tuple[int, int]):
    """Fused CAM -> upsample -> jet -> show_cam_on_image blend.

    Returns (overlay_u8 RGB, heatmap_u8 grayscale) like the reference's
    (show_cam_on_image output, grayscale_cam*255) pair (GRADCAM.py:63-70).
    """
    cam = gradcam_map(params, x, class_idx, config)
    cam_big = jnp.clip(resize_linear(cam, out_hw), 0.0, 1.0)
    heatmap_u8 = (cam_big * 255).astype(jnp.uint8)

    # show_cam_on_image: jet(uint8 cam) BGR -> RGB floats + img, renorm.
    # The exact ramp-form apply_jet is ~20 fusable elementwise int ops
    # per pixel with no big intermediate, so it is used at ANY size; the
    # bounded-resolution approximation below only matters for the
    # one-hot-matmul LUT fallback, which materializes (pixels, 256)
    # floats — gigabytes beyond ~1.5MP displays.
    from cadx_tpu.ops.colormap import _jet_ramps

    if _jet_ramps() is not None or out_hw[0] * out_hw[1] <= 1_500_000:
        jet_bgr = apply_jet(heatmap_u8).astype(jnp.float32) / 255.0
    else:
        scale = (out_hw[0] * out_hw[1] / 1_500_000) ** 0.5
        mid_hw = (max(int(out_hw[0] / scale), 1), max(int(out_hw[1] / scale), 1))
        heat_mid = (jnp.clip(resize_linear(cam, mid_hw), 0.0, 1.0) * 255
                    ).astype(jnp.uint8)
        jet_mid = apply_jet(heat_mid).astype(jnp.float32)
        jet_bgr = jnp.clip(resize_linear(jet_mid, out_hw), 0, 255) / 255.0
    jet_rgb = jet_bgr[..., ::-1]
    if display_img_u8.ndim == 2:
        img_rgb = jnp.stack([display_img_u8] * 3, axis=-1)
    else:
        img_rgb = display_img_u8
    img_f = img_rgb.astype(jnp.float32) / 255.0
    cam_img = jet_rgb + img_f
    cam_img = cam_img / jnp.maximum(cam_img.max(), 1e-7)
    overlay_rgb = (cam_img * 255).astype(jnp.uint8)
    return overlay_rgb, heatmap_u8


# ---------------------------------------------------------------------------
# Reference-semantics Grad-CAM: pretrained ResNet50 layer4 over the
# display image (GRADCAM.py:16-53). The default serving CAM above explains
# the framework's own classifier (a deliberate redesign — see PARITY.md);
# this path reproduces the reference's heatmaps exactly when the user
# supplies resnet50 weights.
# ---------------------------------------------------------------------------

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def imagenet_input_from_gray(img_u8: jax.Array) -> jax.Array:
    """GRADCAM.py:24-28 + :46-50: grayscale 0-255 -> 3-channel [0,1] stack
    -> ImageNet-normalized (1, H, W, 3) tensor."""
    img_f = img_u8.astype(jnp.float32) / 255.0
    rgb = jnp.stack([img_f] * 3, axis=-1)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return ((rgb - mean) / std)[None]


@functools.partial(jax.jit, static_argnames=("config", "class_idx"))
def resnet_gradcam_map(params, x: jax.Array, class_idx: int, config) -> jax.Array:
    """Normalized [0,1] CAM over layer4 activations for one normalized
    input (1, H, W, 3) — pytorch-grad-cam's GradCAM on layer4[-1]:
    weights = GAP(d logit_class / d layer4), cam = relu(sum_k w_k A_k),
    min-max scaled at feature resolution (scale_cam_image)."""
    from cadx_tpu.models import resnet

    acts = resnet.layer4_features(params, x, config)
    _, vjp_fn = jax.vjp(lambda f: resnet.head_logits(params, f, config), acts)
    seed = jnp.zeros((1, config.num_classes)).at[0, class_idx].set(1.0)
    (grads,) = vjp_fn(seed)
    return cam_from_acts_grads(acts, grads)[0]


@functools.partial(jax.jit, static_argnames=("config", "class_idx", "out_hw"))
def resnet_gradcam_overlay(params, img_u8: jax.Array, class_idx: int,
                           config, out_hw: tuple[int, int]):
    """Fused preprocess -> CAM -> upsample -> show_cam_on_image blend.
    Returns (overlay_u8 RGB, heatmap_u8 grayscale), the reference's
    (show_cam_on_image output, grayscale_cam*255) pair (GRADCAM.py:63-70)."""
    x = imagenet_input_from_gray(img_u8)
    cam = resnet_gradcam_map(params, x, class_idx, config)
    cam_big = resize_linear(cam, out_hw)
    # pytorch-grad-cam runs scale_cam_image AGAIN after the resize
    # (BaseCAM.compute_cam_per_layer -> scale_cam_image(cam, target_size));
    # bilinear output of a [0,1] map has min>0/max<1, so skipping this
    # second min-max shifts heatmaps by several u8 counts
    cam_big = cam_big - cam_big.min()
    cam_big = cam_big / (1e-7 + cam_big.max())
    heatmap_u8 = (cam_big * 255).astype(jnp.uint8)
    jet_rgb = apply_jet(heatmap_u8).astype(jnp.float32)[..., ::-1] / 255.0
    img_f = jnp.stack([img_u8.astype(jnp.float32) / 255.0] * 3, axis=-1)
    cam_img = jet_rgb + img_f
    cam_img = cam_img / jnp.maximum(cam_img.max(), 1e-7)
    return (cam_img * 255).astype(jnp.uint8), heatmap_u8


def generate_reference_gradcam_overlays(params, config, display_img,
                                        classes_to_test=(0, 1),
                                        save_folder: str = "explainability") -> dict:
    """GRADCAM.py:31-81 with reference filenames, driven by an imported
    resnet50 (models.resnet.params_from_state_dict)."""
    import cv2

    os.makedirs(save_folder, exist_ok=True)
    img = np.asarray(display_img)
    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    overlays = {}
    for class_idx in classes_to_test:
        ov_rgb, hm = resnet_gradcam_overlay(
            jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(img),
            int(class_idx), config, img.shape[:2])
        ov_rgb, hm = np.asarray(ov_rgb), np.asarray(hm)
        cv2.imwrite(os.path.join(save_folder, f"gradcam_overlay_class_{class_idx}.png"),
                    cv2.cvtColor(ov_rgb, cv2.COLOR_RGB2BGR))
        cv2.imwrite(os.path.join(save_folder, f"gradcam_heatmap_class_{class_idx}.png"), hm)
        overlays[class_idx] = (ov_rgb, hm)
    return overlays


def generate_dual_class_gradcam_overlays(params, config: cnn.CNNConfig,
                                         features, display_img,
                                         classes_to_test=(0, 1),
                                         save_folder: str = "explainability") -> dict:
    """Reference entrypoint + filenames (GRADCAM.py:31-81): writes
    gradcam_overlay_class_{i}.png (BGR on disk, like cv2.imwrite of the
    RGB->BGR converted overlay) and gradcam_heatmap_class_{i}.png."""
    os.makedirs(save_folder, exist_ok=True)
    img = np.asarray(display_img)
    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    out_hw = img.shape[:2]
    overlays = {}
    for class_idx in classes_to_test:
        ov_rgb, hm = gradcam_overlay(
            params, jnp.asarray(features, jnp.float32), jnp.asarray(img),
            int(class_idx), config, out_hw,
        )
        ov_rgb, hm = np.asarray(ov_rgb), np.asarray(hm)
        import cv2

        cv2.imwrite(os.path.join(save_folder, f"gradcam_overlay_class_{class_idx}.png"),
                    cv2.cvtColor(ov_rgb, cv2.COLOR_RGB2BGR))
        cv2.imwrite(os.path.join(save_folder, f"gradcam_heatmap_class_{class_idx}.png"), hm)
        overlays[class_idx] = (ov_rgb, hm)
    return overlays
