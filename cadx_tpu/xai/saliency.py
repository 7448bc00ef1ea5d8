"""Input-gradient saliency, the reference's manual NumPy XAI path.

Reference semantics (WebApplicationPrototype/explainability.py): for each
target class, run forward (no dropout), backprop the softmax-CE seed
(probs - onehot) to the INPUT, then saliency = channel-max of |d_input|,
min-max normalized, JET-colormapped, resized to the display image, and
alpha-blended 0.5/0.5 (cv2.addWeighted). Here the backward is jax.grad
and the whole map->colormap->resize->blend tail is fused into one XLA
program per class (the BASELINE.json "fused activation x gradient ->
upsample -> overlay" requirement).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from cadx_tpu.models import cnn
from cadx_tpu.ops.colormap import add_weighted, apply_jet, normalize_to_u8
from cadx_tpu.ops.resize import resize_linear


@functools.partial(jax.jit, static_argnames=("config", "class_idx"))
def input_gradient(params, x: jax.Array, class_idx: int,
                   config: cnn.CNNConfig) -> jax.Array:
    """d(CE loss wrt target class)/d(input) for one sample (H, W, C).

    Identical to the reference backward chain seeded with probs - onehot
    (explainability.py:13-68 -> d_input), via jax.grad.
    """
    y = jax.nn.one_hot(class_idx, config.num_classes)

    def loss(xin):
        return cnn.loss_fn(params, xin[None], y[None], config, training=False)

    return jax.grad(loss)(x)


def saliency_map_u8(d_input: jax.Array) -> jax.Array:
    """Channel-max |grad| -> min-max normalize -> uint8 (explainability.py:72-74)."""
    s = jnp.abs(d_input).max(axis=-1)
    return normalize_to_u8(s)


@functools.partial(jax.jit, static_argnames=("config", "class_idx", "out_hw"))
def saliency_overlay(params, x: jax.Array, display_img_u8: jax.Array,
                     class_idx: int, config: cnn.CNNConfig,
                     out_hw: tuple[int, int]):
    """Fused: grad -> saliency -> JET -> resize -> 0.5/0.5 blend.

    display_img_u8: (H, W) or (H, W, 3) uint8 image the heatmap overlays.
    Returns (overlay_u8 BGR, heatmap_u8 BGR) at out_hw, matching
    generate_saliency_overlay (explainability.py:71-78).
    """
    d_input = input_gradient(params, x, class_idx, config)
    sal = saliency_map_u8(d_input)
    heat_small = apply_jet(sal)
    # reference: cv2.resize(heatmap, (W, H)) with default INTER_LINEAR,
    # applied to the uint8 BGR heatmap, truncating like OpenCV
    heat = resize_linear(heat_small.astype(jnp.float32), out_hw)
    heat = jnp.clip(jnp.round(heat), 0, 255).astype(jnp.uint8)
    if display_img_u8.ndim == 2:
        display_img_u8 = jnp.stack([display_img_u8] * 3, axis=-1)
    overlay = add_weighted(display_img_u8, 0.5, heat, 0.5, 0.0)
    return overlay, heat


def generate_dual_class_overlays(params, config: cnn.CNNConfig,
                                 features, display_img,
                                 classes_to_test=(0, 1),
                                 save_folder: str = "explainability") -> dict:
    """Host wrapper matching the reference entrypoint + file naming
    (explainability.py:81-108): writes overlay_class_{i}.png and
    heatmap_class_{i}.png into save_folder."""
    os.makedirs(save_folder, exist_ok=True)
    img = np.asarray(display_img)
    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    out_hw = img.shape[:2]
    overlays = {}
    for class_idx in classes_to_test:
        ov, hm = saliency_overlay(
            params, jnp.asarray(features, jnp.float32), jnp.asarray(img),
            int(class_idx), config, out_hw,
        )
        ov, hm = np.asarray(ov), np.asarray(hm)
        _imwrite(os.path.join(save_folder, f"overlay_class_{class_idx}.png"), ov)
        _imwrite(os.path.join(save_folder, f"heatmap_class_{class_idx}.png"), hm)
        overlays[class_idx] = (ov, hm)
    return overlays


def _imwrite(path: str, img: np.ndarray) -> None:
    import cv2

    cv2.imwrite(path, img)
