"""ResNet family (basic + bottleneck blocks) with torch state-dict import.

The deployed reference depends on two pretrained torch ResNets:

- smp.Unet(encoder_name="resnet34", encoder_weights="imagenet") whose
  encoder children produce the app's "segmentation masks"
  (/root/reference/WebApplicationPrototype/app.py:78-94), and
- torchvision resnet50(pretrained=True) whose layer4[-1] is the
  Grad-CAM target (/root/reference/WebApplicationPrototype/GRADCAM.py:16,52-53).

Neither weights file can be fetched here, but a user who supplies their
own .pth must get the reference's exact feature values back. This module
provides the TPU-native architectures (NHWC, inference-mode batch norm,
functional pytrees) and `params_from_state_dict` to import any
torchvision/smp-layout ResNet state dict (conv weights OIHW->HWIO,
bn running stats, downsample projections, optional fc head).

ResNet-34 pytrees produced here are structurally identical to
`models.unet.init_resnet_encoder`'s, so imported encoder weights drop
straight into the serving engine's feature extractor.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from cadx_tpu.models.unet import (
    _bn_apply,
    _bn_params,
    _he_conv,
    _max_pool_plain,
    conv2d_strided,
)


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    block: str = "basic"                      # "basic" | "bottleneck"
    layers: tuple[int, ...] = (3, 4, 6, 3)
    widths: tuple[int, ...] = (64, 128, 256, 512)
    in_channels: int = 3
    num_classes: int | None = None            # None -> encoder only (no fc)

    @property
    def expansion(self) -> int:
        return 1 if self.block == "basic" else 4


RESNET34 = ResNetConfig(block="basic", layers=(3, 4, 6, 3))
RESNET50 = ResNetConfig(block="bottleneck", layers=(3, 4, 6, 3))
RESNET50_CLASSIFIER = dataclasses.replace(RESNET50, num_classes=1000)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_resnet(rng: jax.Array, config: ResNetConfig) -> dict:
    """Random-init pytree with the torchvision layout (he conv, bn
    scale=1/bias=0, running mean=0/var=1)."""
    key_iter = _KeyIter(rng)
    params: dict[str, Any] = {
        "conv1": {"kernel": _he_conv(key_iter(), 7, 7, config.in_channels, 64)},
        "bn1": _bn_params(64),
        "stages": [],
    }
    cin = 64
    for si, (n_blocks, width) in enumerate(zip(config.layers, config.widths)):
        stage = []
        for bi in range(n_blocks):
            stride = 2 if (si > 0 and bi == 0) else 1
            cout = width * config.expansion
            if config.block == "basic":
                block = {
                    "conv1": {"kernel": _he_conv(key_iter(), 3, 3, cin, width)},
                    "bn1": _bn_params(width),
                    "conv2": {"kernel": _he_conv(key_iter(), 3, 3, width, width)},
                    "bn2": _bn_params(width),
                }
            else:
                block = {
                    "conv1": {"kernel": _he_conv(key_iter(), 1, 1, cin, width)},
                    "bn1": _bn_params(width),
                    "conv2": {"kernel": _he_conv(key_iter(), 3, 3, width, width)},
                    "bn2": _bn_params(width),
                    "conv3": {"kernel": _he_conv(key_iter(), 1, 1, width, cout)},
                    "bn3": _bn_params(cout),
                }
            if stride != 1 or cin != cout:
                block["downsample"] = {
                    "kernel": _he_conv(key_iter(), 1, 1, cin, cout),
                    "bn": _bn_params(cout),
                }
            stage.append(block)
            cin = cout
        params["stages"].append(stage)
    if config.num_classes is not None:
        limit = 1.0 / np.sqrt(cin)
        params["fc"] = {
            "kernel": jax.random.uniform(
                key_iter(), (cin, config.num_classes), jnp.float32, -limit, limit),
            "bias": jnp.zeros((config.num_classes,)),
        }
    return params


class _KeyIter:
    def __init__(self, rng):
        self._key = rng

    def __call__(self):
        self._key, k = jax.random.split(self._key)
        return k


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

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


def _bottleneck_block(p, x, stride):
    """torchvision Bottleneck: 1x1 reduce -> 3x3 (stride here, torchvision
    default since v0.4 'ResNet V1.5') -> 1x1 expand(x4), relu after add."""
    identity = x
    out = conv2d_strided(x, p["conv1"]["kernel"], stride=1, pad=0)
    out = jax.nn.relu(_bn_apply(p["bn1"], out))
    out = conv2d_strided(out, p["conv2"]["kernel"], stride=stride, pad=1)
    out = jax.nn.relu(_bn_apply(p["bn2"], out))
    out = conv2d_strided(out, p["conv3"]["kernel"], stride=1, pad=0)
    out = _bn_apply(p["bn3"], out)
    if "downsample" in p:
        identity = conv2d_strided(x, p["downsample"]["kernel"], stride=stride, pad=0)
        identity = _bn_apply(p["downsample"]["bn"], identity)
    return jax.nn.relu(out + identity)


def stage_features(params: dict, x: jax.Array,
                   config: ResNetConfig) -> list[jax.Array]:
    """Outputs after each encoder child in torchvision named_children
    order — [conv1, bn1, relu, maxpool, layer1..layer4] — mirroring the
    app's extract_encoder_features loop (app.py:89-94). x: (B, H, W, C)."""
    block_fn = _basic_block if config.block == "basic" else _bottleneck_block
    feats = []
    x = conv2d_strided(x, params["conv1"]["kernel"], stride=2, pad=3)
    feats.append(x)                       # features[0]: RAW conv1 output
    x = _bn_apply(params["bn1"], x)
    feats.append(x)
    x = jax.nn.relu(x)
    feats.append(x)
    x = _max_pool_plain(x, 3, 2, pad=1)
    feats.append(x)
    for si, stage in enumerate(params["stages"]):
        first_stride = 1 if si == 0 else 2
        for bi, block in enumerate(stage):
            x = block_fn(block, x, first_stride if bi == 0 else 1)
        feats.append(x)
    return feats


def forward(params: dict, x: jax.Array, config: ResNetConfig) -> jax.Array:
    """Full classifier forward: stages -> global average pool -> fc.
    Returns (B, num_classes) logits. x: (B, H, W, C)."""
    feats = stage_features(params, x, config)
    pooled = feats[-1].mean(axis=(1, 2))           # AdaptiveAvgPool2d(1)
    return pooled @ params["fc"]["kernel"] + params["fc"]["bias"]


def layer4_features(params: dict, x: jax.Array,
                    config: ResNetConfig) -> jax.Array:
    """The Grad-CAM target activations (model.layer4[-1] output,
    GRADCAM.py:52-53)."""
    return stage_features(params, x, config)[-1]


def head_logits(params: dict, layer4: jax.Array,
                config: ResNetConfig) -> jax.Array:
    """avgpool+fc applied to layer4 activations — the split point for the
    Grad-CAM vjp."""
    del config
    pooled = layer4.mean(axis=(1, 2))
    return pooled @ params["fc"]["kernel"] + params["fc"]["bias"]


# ---------------------------------------------------------------------------
# torch state-dict import
# ---------------------------------------------------------------------------

def _np(t) -> np.ndarray:
    """torch.Tensor | np.ndarray -> np.ndarray without importing torch."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _conv_hwio(t) -> jnp.ndarray:
    return jnp.asarray(_np(t).transpose(2, 3, 1, 0))     # OIHW -> HWIO


def _bn_import(sd: Mapping, prefix: str) -> dict:
    return {
        "scale": jnp.asarray(_np(sd[prefix + ".weight"])),
        "bias": jnp.asarray(_np(sd[prefix + ".bias"])),
        "mean": jnp.asarray(_np(sd[prefix + ".running_mean"])),
        "var": jnp.asarray(_np(sd[prefix + ".running_var"])),
    }


def detect_config(sd: Mapping[str, Any]) -> ResNetConfig:
    """Infer block type / stage depths / widths / in_channels / fc from the
    state-dict keys alone (works for torchvision resnet18-152 and smp
    resnet encoders)."""
    block = "bottleneck" if "layer1.0.conv3.weight" in sd else "basic"
    layers, widths = [], []
    for li in range(1, 5):
        n = 0
        while f"layer{li}.{n}.conv1.weight" in sd:
            n += 1
        if n == 0:
            break
        layers.append(n)
        widths.append(int(_np(sd[f"layer{li}.0.conv1.weight"]).shape[0])
                      if block == "bottleneck"
                      else int(_np(sd[f"layer{li}.0.conv2.weight"]).shape[0]))
    in_channels = int(_np(sd["conv1.weight"]).shape[1])
    num_classes = (int(_np(sd["fc.weight"]).shape[0])
                   if "fc.weight" in sd else None)
    return ResNetConfig(block=block, layers=tuple(layers), widths=tuple(widths),
                        in_channels=in_channels, num_classes=num_classes)


def strip_prefix(sd: Mapping[str, Any], prefix: str | None = None) -> dict:
    """Remove a key prefix. With prefix=None, auto-detects the smp
    'encoder.' prefix (smp.Unet state dicts store the resnet under it)."""
    if prefix is None:
        prefix = "encoder." if any(k.startswith("encoder.conv1") for k in sd) else ""
    if not prefix:
        return dict(sd)
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def params_from_state_dict(
    sd: Mapping[str, Any], config: ResNetConfig | None = None,
    prefix: str | None = None,
) -> tuple[ResNetConfig, dict]:
    """torch state dict -> (config, pytree). Accepts torchvision resnets
    and smp resnet encoders (auto-stripped 'encoder.' prefix); tensors may
    be torch.Tensors or numpy arrays."""
    sd = strip_prefix(sd, prefix)
    if config is None:
        config = detect_config(sd)
    params: dict[str, Any] = {
        "conv1": {"kernel": _conv_hwio(sd["conv1.weight"])},
        "bn1": _bn_import(sd, "bn1"),
        "stages": [],
    }
    for li, n_blocks in enumerate(config.layers, start=1):
        stage = []
        for bi in range(n_blocks):
            p = f"layer{li}.{bi}"
            block = {
                "conv1": {"kernel": _conv_hwio(sd[p + ".conv1.weight"])},
                "bn1": _bn_import(sd, p + ".bn1"),
                "conv2": {"kernel": _conv_hwio(sd[p + ".conv2.weight"])},
                "bn2": _bn_import(sd, p + ".bn2"),
            }
            if config.block == "bottleneck":
                block["conv3"] = {"kernel": _conv_hwio(sd[p + ".conv3.weight"])}
                block["bn3"] = _bn_import(sd, p + ".bn3")
            if p + ".downsample.0.weight" in sd:
                block["downsample"] = {
                    "kernel": _conv_hwio(sd[p + ".downsample.0.weight"]),
                    "bn": _bn_import(sd, p + ".downsample.1"),
                }
            stage.append(block)
        params["stages"].append(stage)
    if config.num_classes is not None and "fc.weight" in sd:
        params["fc"] = {
            "kernel": jnp.asarray(_np(sd["fc.weight"]).T),   # (out,in) -> (in,out)
            "bias": jnp.asarray(_np(sd["fc.bias"])),
        }
    return config, params


def load_state_dict_file(path: str):
    """Read a .pth/.pt file into a state dict (torch runtime required for
    unpickling; weights_only=True keeps it data-only)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if "state_dict" in obj and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    return obj


def encoder_params_from_state_dict(sd_or_path, prefix: str | None = None
                                   ) -> tuple[ResNetConfig, dict]:
    """Import an smp/torchvision resnet (path or dict) for use as the
    serving engine's feature encoder. The returned pytree is
    layout-compatible with models.unet.resnet_encoder_features for basic
    blocks, and with resnet.stage_features for both block types."""
    if isinstance(sd_or_path, (str, bytes)):
        sd_or_path = load_state_dict_file(sd_or_path)
    return params_from_state_dict(sd_or_path, prefix=prefix)
