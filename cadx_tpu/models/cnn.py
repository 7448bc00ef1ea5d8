"""TPU-native CNN classifier matching the reference model family.

Reference contract (Classes/CNNModel.py:67-277): a configurable stack of
[VALID 3x3 conv + bias + LeakyReLU, 2x2 max pool] blocks, a flatten, a
chain of dense+LeakyReLU(+inverted dropout) layers, and a softmax output
layer. Conv weights are He-normal, dense weights Xavier-uniform. The
softmax upcasts, clips logits to +/-50, and guards a zero denominator
(Classes/CNNModel.py:203-212).

Design: pure functional pytree params + jit-compiled batched apply. The
reference runs one sample at a time through Python loops (91.5h for 20
epochs on 245 images); here the whole batch is one XLA program on the MXU.
Max-pool uses a custom VJP reproducing the reference's tie-broadcast
gradient (see cadx_tpu.ops.pool).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from cadx_tpu.ops.conv import conv2d, leaky_relu
from cadx_tpu.ops.pool import max_pool_ties


@dataclasses.dataclass(frozen=True)
class CNNConfig:
    """Architecture config; JSON round-trips to the reference npz schema."""

    input_shape: tuple[int, int, int]  # (H, W, C)
    num_classes: int
    conv_layers: tuple[tuple[int, int], ...] = ((8, 3), (16, 3))  # (filters, ksize)
    hidden_units: tuple[int, ...] = (128, 64)
    dropout_rate: float = 0.3
    leaky_alpha: float = 0.01
    conv_padding: str = "VALID"  # "VALID" = basic model; 1-pad SAME-ish = advanced

    def __post_init__(self):
        if self.conv_padding not in ("VALID", "SAME"):
            raise ValueError(
                f"conv_padding must be 'VALID' or 'SAME', got "
                f"{self.conv_padding!r}")
        h, w, _ = self.input_shape
        for i, (f, k) in enumerate(self.conv_layers):
            if self.conv_padding == "VALID":
                h, w = h - k + 1, w - k + 1
            if h < 1 or w < 1:
                raise ValueError(
                    f"conv layer {i} ({f} filters, k={k}) reduces the spatial "
                    f"size to {h}x{w}; input {self.input_shape} is too small "
                    f"for conv_layers={self.conv_layers}"
                )
            h, w = h // 2, w // 2
            if h < 1 or w < 1:
                raise ValueError(
                    f"pool after conv layer {i} reduces the spatial size to "
                    f"{h}x{w}; input {self.input_shape} is too small"
                )

    def to_json_dict(self) -> dict[str, Any]:
        # Key names/order match the reference save_model config
        # (Classes/CNNModel.py:535-541 + leaky_alpha as in load_weights :45).
        out = {
            "input_shape": list(self.input_shape),
            "num_classes": self.num_classes,
            "conv_layers": [list(cl) for cl in self.conv_layers],
            "hidden_units": list(self.hidden_units),
            "dropout_rate": self.dropout_rate,
            "leaky_alpha": self.leaky_alpha,
        }
        if self.conv_padding != "VALID":
            # schema extension: SAME models must not round-trip as VALID
            # (basic/reference models keep the exact reference key set)
            out["conv_padding"] = self.conv_padding
        return out

    @classmethod
    def from_json_dict(cls, d: dict[str, Any]) -> "CNNConfig":
        return cls(
            input_shape=tuple(d["input_shape"]),
            num_classes=int(d["num_classes"]),
            conv_layers=tuple(tuple(cl) for cl in d["conv_layers"]),
            hidden_units=tuple(d["hidden_units"]),
            dropout_rate=float(d["dropout_rate"]),
            leaky_alpha=float(d.get("leaky_alpha", 0.01)),
            conv_padding=d.get("conv_padding", "VALID"),
        )

    # ---- derived shapes ----
    def conv_output_shapes(self) -> list[tuple[int, int, int]]:
        """Post-conv (pre-pool) shapes per block, reference valid-conv arithmetic."""
        h, w, c = self.input_shape
        shapes = []
        for f, k in self.conv_layers:
            if self.conv_padding == "VALID":
                h, w = h - k + 1, w - k + 1
            shapes.append((h, w, f))
            h, w, c = h // 2, w // 2, f
        return shapes

    def flatten_size(self) -> int:
        h, w, c = self.input_shape
        for f, k in self.conv_layers:
            if self.conv_padding == "VALID":
                h, w = h - k + 1, w - k + 1
            h, w, c = h // 2, w // 2, f
        return h * w * c

    def layer_indices(self) -> dict[str, Any]:
        """Reference `self.layers` index layout: conv,pool pairs then dense, output.

        Needed to read/write the reference ``W{i}/b{i}`` npz keys
        (Classes/CNNModel.py:543-554).
        """
        idx = 0
        conv_idx, dense_idx = [], []
        for _ in self.conv_layers:
            conv_idx.append(idx)
            idx += 2  # conv layer + its pool layer
        for _ in self.hidden_units:
            dense_idx.append(idx)
            idx += 1
        return {"conv": conv_idx, "dense": dense_idx, "output": idx}


def init_params(rng: jax.Array, config: CNNConfig, dtype=jnp.float32) -> dict:
    """He-normal convs, Xavier-uniform dense, zero biases (reference init)."""
    params: dict[str, Any] = {"conv": [], "dense": []}
    c_in = config.input_shape[2]
    keys = jax.random.split(rng, len(config.conv_layers) + len(config.hidden_units) + 1)
    ki = 0
    for f, k in config.conv_layers:
        std = jnp.sqrt(2.0 / (k * k * c_in))
        kernel = jax.random.normal(keys[ki], (k, k, c_in, f), dtype) * std
        params["conv"].append({"kernel": kernel, "bias": jnp.zeros((f,), dtype)})
        c_in = f
        ki += 1
    prev = config.flatten_size()
    for units in config.hidden_units:
        limit = jnp.sqrt(6.0 / (prev + units))
        kernel = jax.random.uniform(keys[ki], (prev, units), dtype, -limit, limit)
        params["dense"].append({"kernel": kernel, "bias": jnp.zeros((units,), dtype)})
        prev = units
        ki += 1
    limit = jnp.sqrt(6.0 / (prev + config.num_classes))
    params["output"] = {
        "kernel": jax.random.uniform(
            keys[ki], (prev, config.num_classes), dtype, -limit, limit
        ),
        "bias": jnp.zeros((config.num_classes,), dtype),
    }
    return params


def reference_softmax(z: jax.Array) -> jax.Array:
    """The reference's guarded softmax (Classes/CNNModel.py:203-212).

    Clips logits to [-50, 50], max-subtracts, and adds 1e-12 to the
    denominator. (The reference upcasts to float64 on host; on TPU we stay
    in float32 — parity tests bound the difference.)
    """
    z = jnp.clip(z, -50.0, 50.0)
    z = z - jnp.max(z, axis=-1, keepdims=True)
    exps = jnp.exp(z)
    s = jnp.sum(exps, axis=-1, keepdims=True)
    uniform = jnp.ones_like(z) / z.shape[-1]
    return jnp.where(s == 0, uniform, exps / (s + 1e-12))


# HIGHEST precision keeps TPU results faithful to the float64 oracle
# (default MXU bf16 passes drift ~3e-3); these matmuls are tiny.
_dot = functools.partial(jnp.dot, precision=jax.lax.Precision.HIGHEST)


def conv_stack(params: dict, x: jax.Array, config: CNNConfig, *,
               compute_dtype=None) -> jax.Array:
    """The conv+pool feature stack -> (B, h, w, F) activations.

    Shared by apply() and the Grad-CAM split forward (xai.gradcam) so the
    CAM is always computed on the same network predict() uses. SAME
    padding is true same (k//2) for odd kernels — identical to the torch
    advanced model's padding=1 at its k=3.

    compute_dtype (e.g. jnp.bfloat16): opt-in mixed precision for the
    conv MXU work — inputs/kernels cast down, single-pass MXU instead of
    the f32-faithful HIGHEST passes. The MXU accumulates f32 internally
    but each conv RESULT is rounded to compute_dtype (ops/conv.py picks
    preferred_element_type from the operand dtype — an f32 result type
    over bf16 operands breaks the conv transpose). Params and the head
    remain f32; prediction parity is tolerance-level (~1e-3), so this is
    for the training fast path, never the parity-contracted default."""
    alpha = config.leaky_alpha
    out = x
    precision = None
    if compute_dtype is not None:
        # the ONLY explicit downcast: conv2d returns out.astype(x.dtype)
        # and leaky/pool preserve dtype, so bf16 propagates layer-to-layer
        out = out.astype(compute_dtype)
        precision = jax.lax.Precision.DEFAULT
    for layer in params["conv"]:
        kernel = layer["kernel"]
        if compute_dtype is not None:
            kernel = kernel.astype(compute_dtype)
        k = kernel.shape[0]
        padding = "VALID" if config.conv_padding == "VALID" else k // 2
        out = leaky_relu(conv2d(out, kernel, layer["bias"], padding=padding,
                                precision=precision), alpha)
        out = max_pool_ties(out, 2)
    return out


def head_logits(params: dict, feats: jax.Array, config: CNNConfig, *,
                training: bool = False, rng: jax.Array | None = None) -> jax.Array:
    """Dense+LeakyReLU(+dropout) chain + output logits from conv features."""
    alpha = config.leaky_alpha
    out = feats.reshape(feats.shape[0], -1)
    if training and config.dropout_rate > 0.0 and rng is not None:
        drop_keys = jax.random.split(rng, len(params["dense"]))
    for i, layer in enumerate(params["dense"]):
        z = _dot(out, layer["kernel"]) + layer["bias"]
        out = leaky_relu(z, alpha)
        if training and config.dropout_rate > 0.0 and rng is not None:
            keep = jax.random.uniform(drop_keys[i], out.shape) > config.dropout_rate
            out = out * keep.astype(out.dtype) / (1.0 - config.dropout_rate)
    return _dot(out, params["output"]["kernel"]) + params["output"]["bias"]


def apply(
    params: dict,
    x: jax.Array,
    config: CNNConfig,
    *,
    training: bool = False,
    rng: jax.Array | None = None,
    compute_dtype=None,
) -> jax.Array:
    """Batched forward pass -> logits. x: (B, H, W, C) float32.

    Mirrors the reference forward (Classes/CNNModel.py:162-198) with the
    sample loop replaced by batching: conv+LeakyReLU, tie-semantics max
    pool, flatten (row-major H,W,C like NumPy .flatten()), dense+LeakyReLU
    with inverted dropout, then the output layer's pre-softmax logits.
    compute_dtype: see conv_stack (opt-in bf16 conv compute; head f32).
    """
    feats = conv_stack(params, x, config, compute_dtype=compute_dtype)
    if compute_dtype is not None:
        feats = feats.astype(jnp.float32)
    return head_logits(params, feats, config, training=training, rng=rng)


def forward(params, x, config, *, training=False, rng=None) -> jax.Array:
    """Forward to probabilities (reference `forward` returns softmax probs)."""
    return reference_softmax(apply(params, x, config, training=training, rng=rng))


def predict(params, x, config):
    """(argmax class, probs) per sample — reference `predict` (CNNModel.py:524)."""
    probs = forward(params, x, config, training=False)
    return jnp.argmax(probs, axis=-1), probs


def cross_entropy(probs: jax.Array, y_onehot: jax.Array) -> jax.Array:
    """Reference loss (Classes/CNNModel.py:360-367): clip probs then NLL.

    1D inputs -> scalar sum; batched -> mean over batch.
    """
    probs = jnp.clip(probs, 1e-12, 1.0)
    per_sample = -jnp.sum(y_onehot * jnp.log(probs), axis=-1)
    return per_sample if probs.ndim == 1 else jnp.mean(per_sample)


def loss_fn(params, x, y_onehot, config, *, training=False, rng=None) -> jax.Array:
    """Mean softmax cross-entropy whose gradient is exactly (probs - y)/B.

    The reference backward seeds d_logits = probs - y_onehot
    (Classes/CNNModel.py:297-299) and averages accumulated per-sample grads
    over the batch; differentiating this loss reproduces that analytically.
    """
    logits = apply(params, x, config, training=training, rng=rng)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(y_onehot * logp, axis=-1))


def grads_fn(params, x, y_onehot, config, *, training=False, rng=None):
    """(loss, grads) — batch-averaged, unclipped (clipping happens at apply)."""
    return jax.value_and_grad(loss_fn)(params, x, y_onehot, config, training=training, rng=rng)


def num_params(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
