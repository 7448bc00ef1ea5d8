"""Advanced-pipeline compat: import the reference's PyTorch checkpoints.

The reference's "advanced" model is a torch CNN (ADCNNM.py:34-78:
Conv2d(pad=1)+MaxPool2d(2) stack with LeakyReLU, then Linear stack) whose
best weights are persisted as a state_dict (.pth) and rebuilt from the
training-summary JSON (load_trained_model, ADCNNM.py:155-202). This
module loads those artifacts into our functional JAX model:

- conv kernels: OIHW -> HWIO
- linear weights: (out, in) -> (in, out)
- the FIRST linear layer additionally needs its input dimension permuted
  from torch's NCHW flatten order (C,H,W) to our NHWC flatten (H,W,C).

torch is only required for reading the .pth file.
"""

from __future__ import annotations

import json

import numpy as np

import jax.numpy as jnp

from cadx_tpu.models import cnn
from cadx_tpu.train.summary import config_from_summary


def advanced_config_from_summary(summary: dict) -> cnn.CNNConfig:
    """Advanced models use padding=1 convs (ADCNNM.py:48), which equals
    SAME only for 3x3 kernels — reject other sizes rather than silently
    computing a different network."""
    base = config_from_summary(summary)
    bad = [k for _, k in base.conv_layers if k != 3]
    if bad:
        raise ValueError(
            f"torch-compat import supports 3x3 convs only (padding=1 == "
            f"SAME); got kernel sizes {bad}")
    import dataclasses

    return dataclasses.replace(base, conv_padding="SAME")


def _flatten_hwc(config: cnn.CNNConfig) -> tuple[int, int, int]:
    """Post-final-pool (h, w, c) — derived from CNNConfig's own shape
    walk rather than a fourth copy of the conv/pool arithmetic."""
    h, w, f = config.conv_output_shapes()[-1]
    return h // 2, w // 2, f


def params_from_torch_state_dict(state_dict: dict, config: cnn.CNNConfig) -> dict:
    """Convert an ADCNNM-layout torch state_dict to our params pytree."""

    def arr(v):
        # works for torch tensors and numpy arrays
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    params: dict = {"conv": [], "dense": []}
    for i in range(len(config.conv_layers)):
        w = arr(state_dict[f"convs.{i}.weight"])          # (O, I, kh, kw)
        b = arr(state_dict[f"convs.{i}.bias"])
        params["conv"].append({
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0), jnp.float32),
            "bias": jnp.asarray(b, jnp.float32),
        })

    # fc stack indices in nn.Sequential: Linear at 0, 3, 6, ... then final
    linear_keys = sorted(
        {int(k.split(".")[1]) for k in state_dict if k.startswith("fc.")
         and k.endswith(".weight")}
    )
    h, w, c = _flatten_hwc(config)
    for pos, li in enumerate(linear_keys):
        wgt = arr(state_dict[f"fc.{li}.weight"])          # (out, in)
        b = arr(state_dict[f"fc.{li}.bias"])
        if pos == 0:
            # reorder the input dim from torch CHW flatten to our HWC
            out_dim = wgt.shape[0]
            wgt = wgt.reshape(out_dim, c, h, w).transpose(0, 2, 3, 1)
            wgt = wgt.reshape(out_dim, h * w * c)
        entry = {
            "kernel": jnp.asarray(wgt.T, jnp.float32),
            "bias": jnp.asarray(b, jnp.float32),
        }
        if pos == len(linear_keys) - 1:
            params["output"] = entry
        else:
            params["dense"].append(entry)
    return params


def torch_state_dict_from_params(params: dict, config: cnn.CNNConfig) -> dict:
    """Inverse of params_from_torch_state_dict: export our params as an
    ADCNNM-layout torch state_dict (conv HWIO -> OIHW, dense transposed,
    first dense input dim permuted back to torch's NCHW flatten order)."""
    import torch

    h, w, c = _flatten_hwc(config)
    out: dict = {}
    for i, layer in enumerate(params["conv"]):
        out[f"convs.{i}.weight"] = torch.tensor(
            np.asarray(layer["kernel"]).transpose(3, 2, 0, 1).copy())
        out[f"convs.{i}.bias"] = torch.tensor(np.asarray(layer["bias"]))

    dense_entries = list(params["dense"]) + [params["output"]]
    li = 0
    for pos, layer in enumerate(dense_entries):
        wgt = np.asarray(layer["kernel"]).T            # (out, in), HWC order
        if pos == 0:
            out_dim = wgt.shape[0]
            wgt = wgt.reshape(out_dim, h, w, c).transpose(0, 3, 1, 2)
            wgt = wgt.reshape(out_dim, c * h * w)
        out[f"fc.{li}.weight"] = torch.tensor(wgt.copy())
        out[f"fc.{li}.bias"] = torch.tensor(np.asarray(layer["bias"]))
        li += 3  # each hidden block is [Linear, LeakyReLU, Dropout]
    return out


def save_trained_model(params: dict, config: cnn.CNNConfig,
                       weight_path: str) -> None:
    """torch.save an ADCNNM-compatible state_dict of our model — lets
    reference-side torch tooling consume TPU-trained weights."""
    import torch

    torch.save(torch_state_dict_from_params(params, config), weight_path)


def load_trained_model(json_path: str, weight_path: str):
    """Reference load_trained_model (ADCNNM.py:155-202): rebuild from the
    summary JSON + .pth state dict. Returns (config, params)."""
    import torch

    with open(json_path) as f:
        summary = json.load(f)
    config = advanced_config_from_summary(summary)
    state_dict = torch.load(weight_path, map_location="cpu", weights_only=True)
    return config, params_from_torch_state_dict(state_dict, config)
