"""U-Net family: tiny autoencoder, general encoder-decoder, ResNet encoder.

Three reference contracts:
- TinyUNet (Classes/Preprocessing.py:176-204): Keras autoencoder
  Conv16->pool->Conv32->pool->Conv64 bottleneck->2x(up+conv)->1x1 sigmoid,
  trained MSE, bottleneck features extracted for classification.
- UNet: full encoder-decoder with skip connections ("U-Net ROI
  segmentation" config in BASELINE.json) — the reference never actually
  trains one, but the capability is first-class here.
- ResNetEncoder (resnet34 layout): replaces the app's pretrained smp
  U-Net encoder (app.py:78-94). The app's "segmentation masks" are
  features[0] == the RAW conv1 (7x7/2, 64ch) output — before bn/relu —
  giving the (64, 256, 256) contract for a 512x512 input.

All models are functional pytrees (init_* / apply pairs), NHWC, fully
jit/vmap/shard_map compatible.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp

from cadx_tpu.ops.conv import conv2d
from cadx_tpu.ops.pool import upsample_nearest


# ---------------------------------------------------------------------------
# shared initializers (Keras defaults: glorot-uniform kernel, zero bias)
# ---------------------------------------------------------------------------

def _glorot_conv(key, kh, kw, cin, cout, dtype=jnp.float32):
    fan_in, fan_out = kh * kw * cin, kh * kw * cout
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, (kh, kw, cin, cout), dtype, -limit, limit)


def _he_conv(key, kh, kw, cin, cout, dtype=jnp.float32):
    std = jnp.sqrt(2.0 / (kh * kw * cin))
    return jax.random.normal(key, (kh, kw, cin, cout), dtype) * std


def _conv_params(key, kh, kw, cin, cout, init=_glorot_conv):
    return {"kernel": init(key, kh, kw, cin, cout), "bias": jnp.zeros((cout,))}


def _bn_params(c):
    return {
        "scale": jnp.ones((c,)),
        "bias": jnp.zeros((c,)),
        "mean": jnp.zeros((c,)),
        "var": jnp.ones((c,)),
    }


def _bn_apply(p, x, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["scale"] + p["bias"]


def _max_pool_plain(x, size=2, stride=None, pad=0):
    """Standard max pool (torch MaxPool2d semantics) — used by resnet."""
    stride = stride or size
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                    constant_values=-jnp.inf)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, size, size, 1), (1, stride, stride, 1),
        "VALID",
    )


# ---------------------------------------------------------------------------
# TinyUNet — Keras tiny_unet parity
# ---------------------------------------------------------------------------

def init_tiny_unet(rng: jax.Array, in_channels: int = 1) -> dict:
    k = jax.random.split(rng, 6)
    return {
        "c1": _conv_params(k[0], 3, 3, in_channels, 16),
        "c2": _conv_params(k[1], 3, 3, 16, 32),
        "bottleneck": _conv_params(k[2], 3, 3, 32, 64),
        "c3": _conv_params(k[3], 3, 3, 64, 32),
        "c4": _conv_params(k[4], 3, 3, 32, 16),
        "out": _conv_params(k[5], 1, 1, 16, 1),
    }


def tiny_unet_apply(params: dict, x: jax.Array, *, return_bottleneck: bool = False):
    """x: (B, H, W, C). Mirrors the Keras graph layer-for-layer."""
    c1 = jax.nn.relu(conv2d(x, params["c1"]["kernel"], params["c1"]["bias"], padding="SAME"))
    p1 = _max_pool_plain(c1)
    c2 = jax.nn.relu(conv2d(p1, params["c2"]["kernel"], params["c2"]["bias"], padding="SAME"))
    p2 = _max_pool_plain(c2)
    bn = jax.nn.relu(conv2d(p2, params["bottleneck"]["kernel"],
                            params["bottleneck"]["bias"], padding="SAME"))
    if return_bottleneck:
        return bn
    u1 = upsample_nearest(bn, 2)
    c3 = jax.nn.relu(conv2d(u1, params["c3"]["kernel"], params["c3"]["bias"], padding="SAME"))
    u2 = upsample_nearest(c3, 2)
    c4 = jax.nn.relu(conv2d(u2, params["c4"]["kernel"], params["c4"]["bias"], padding="SAME"))
    out = jax.nn.sigmoid(conv2d(c4, params["out"]["kernel"], params["out"]["bias"],
                                padding="SAME"))
    return out


def tiny_unet_bottleneck(params: dict, x: jax.Array) -> jax.Array:
    """Bottleneck feature extractor (the reference's bottleneck_model,
    Preprocessing.py:247-248)."""
    return tiny_unet_apply(params, x, return_bottleneck=True)


def tiny_unet_mse(params, x):
    """Autoencoder reconstruction loss (model.compile(loss='mse'))."""
    return jnp.mean((tiny_unet_apply(params, x) - x) ** 2)


# ---------------------------------------------------------------------------
# General U-Net with skip connections
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 1
    out_channels: int = 1
    features: tuple[int, ...] = (16, 32, 64, 128)  # per encoder level
    final_activation: str = "sigmoid"  # "sigmoid" | "none"


def init_unet(rng: jax.Array, config: UNetConfig) -> dict:
    keys = iter(jax.random.split(rng, 4 * len(config.features) + 4))
    params: dict[str, Any] = {"enc": [], "dec": []}
    cin = config.in_channels
    for f in config.features[:-1]:
        params["enc"].append({
            "conv1": _conv_params(next(keys), 3, 3, cin, f, _he_conv),
            "conv2": _conv_params(next(keys), 3, 3, f, f, _he_conv),
        })
        cin = f
    fb = config.features[-1]
    params["bottleneck"] = {
        "conv1": _conv_params(next(keys), 3, 3, cin, fb, _he_conv),
        "conv2": _conv_params(next(keys), 3, 3, fb, fb, _he_conv),
    }
    cin = fb
    for f in reversed(config.features[:-1]):
        params["dec"].append({
            "conv1": _conv_params(next(keys), 3, 3, cin + f, f, _he_conv),
            "conv2": _conv_params(next(keys), 3, 3, f, f, _he_conv),
        })
        cin = f
    params["head"] = _conv_params(next(keys), 1, 1, cin, config.out_channels)
    return params


def _double_conv(p, x):
    x = jax.nn.relu(conv2d(x, p["conv1"]["kernel"], p["conv1"]["bias"], padding="SAME"))
    return jax.nn.relu(conv2d(x, p["conv2"]["kernel"], p["conv2"]["bias"], padding="SAME"))


def unet_apply(params: dict, x: jax.Array, config: UNetConfig) -> jax.Array:
    """Encoder-decoder with skip concats. x: (B, H, W, C), H/W divisible
    by 2**(len(features)-1)."""
    skips = []
    for enc in params["enc"]:
        x = _double_conv(enc, x)
        skips.append(x)
        x = _max_pool_plain(x)
    x = _double_conv(params["bottleneck"], x)
    for dec, skip in zip(params["dec"], reversed(skips)):
        x = upsample_nearest(x, 2)
        x = jnp.concatenate([x, skip], axis=-1)
        x = _double_conv(dec, x)
    x = conv2d(x, params["head"]["kernel"], params["head"]["bias"], padding="SAME")
    if config.final_activation == "sigmoid":
        x = jax.nn.sigmoid(x)
    return x


# ---------------------------------------------------------------------------
# ResNet34-style encoder (the smp U-Net encoder replacement)
# ---------------------------------------------------------------------------

RESNET34_LAYERS = (3, 4, 6, 3)
RESNET34_WIDTHS = (64, 128, 256, 512)


def init_resnet_encoder(rng: jax.Array, in_channels: int = 1,
                        layers: Sequence[int] = RESNET34_LAYERS,
                        widths: Sequence[int] = RESNET34_WIDTHS) -> dict:
    n_keys = 2 + 2 * sum(layers) + len(layers)
    keys = iter(jax.random.split(rng, n_keys))
    params: dict[str, Any] = {
        "conv1": {"kernel": _he_conv(next(keys), 7, 7, in_channels, 64)},
        "bn1": _bn_params(64),
        "stages": [],
    }
    cin = 64
    for si, (n_blocks, width) in enumerate(zip(layers, widths)):
        stage = []
        for bi in range(n_blocks):
            stride = 2 if (si > 0 and bi == 0) else 1
            block = {
                "conv1": {"kernel": _he_conv(next(keys), 3, 3, cin, width)},
                "bn1": _bn_params(width),
                "conv2": {"kernel": _he_conv(next(keys), 3, 3, width, width)},
                "bn2": _bn_params(width),
            }
            if stride != 1 or cin != width:
                block["downsample"] = {
                    "kernel": _he_conv(next(keys), 1, 1, cin, width),
                    "bn": _bn_params(width),
                }
            stage.append(block)
            cin = width
        params["stages"].append(stage)
    return params


def _basic_block(p, x, stride):
    identity = x
    out = conv2d_strided(x, p["conv1"]["kernel"], stride=stride, pad=1)
    out = jax.nn.relu(_bn_apply(p["bn1"], out))
    out = conv2d_strided(out, p["conv2"]["kernel"], stride=1, pad=1)
    out = _bn_apply(p["bn2"], out)
    if "downsample" in p:
        identity = conv2d_strided(x, p["downsample"]["kernel"], stride=stride, pad=0)
        identity = _bn_apply(p["downsample"]["bn"], identity)
    return jax.nn.relu(out + identity)


def conv2d_strided(x, kernel, stride=1, pad=0):
    return jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def resnet_encoder_features(params: dict, x: jax.Array) -> list[jax.Array]:
    """Outputs after each encoder child, mirroring the app's
    extract_encoder_features loop over smp named_children (app.py:89-94):
    [conv1, bn1, relu, maxpool, layer1, layer2, layer3, layer4].
    """
    feats = []
    x = conv2d_strided(x, params["conv1"]["kernel"], stride=2, pad=3)
    feats.append(x)                      # features[0]: RAW conv1 output
    x = _bn_apply(params["bn1"], x)
    feats.append(x)
    x = jax.nn.relu(x)
    feats.append(x)
    x = _max_pool_plain(x, 3, 2, pad=1)
    feats.append(x)
    layers_strides = [1, 2, 2, 2]
    for stage, first_stride in zip(params["stages"], layers_strides):
        for bi, block in enumerate(stage):
            x = _basic_block(block, x, first_stride if bi == 0 else 1)
        feats.append(x)
    return feats


def encoder_first_features(params: dict, img512: jax.Array) -> jax.Array:
    """The app's segmentation contract (app.py:144-150): (B, 512, 512, 1)
    in [0,1] -> (B, 256, 256, 64) raw conv1 features."""
    return conv2d_strided(img512, params["conv1"]["kernel"], stride=2, pad=3)
