"""Convolution ops (XLA `conv_general_dilated`, NHWC/HWIO layouts).

These are the `jax.lax` reference paths; Pallas kernels in
`cadx_tpu.kernels` may be swapped in behind the same signatures. The
reference's "basic" CNN uses VALID stride-1 convs (Classes/CNNModel.py:96-98)
while its Torch "advanced" model uses padding=1 (ADCNNM.py:48) — both
paddings are first-class here.
"""

from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp
from jax import lax

_DIMS = ("NHWC", "HWIO", "NHWC")


def conv2d(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    padding: Literal["VALID", "SAME"] | int = "VALID",
    stride: int = 1,
    precision=None,
) -> jax.Array:
    """2D convolution. x: (B,H,W,C), kernel: (kh,kw,C,F), bias: (F,)."""
    if isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    else:
        pad = padding
    out = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=_DIMS,
        # In reduced-precision mode the accumulator type must match the
        # operand dtype: an f32 preferred_element_type over bf16 operands
        # makes the conv TRANSPOSE pair an f32 cotangent with the bf16
        # kernel (dtype error). The MXU still accumulates f32 internally
        # either way; this only selects the rounding of the result.
        preferred_element_type=(jnp.float32 if x.dtype == jnp.float32
                                else x.dtype),
        # HIGHEST (the default here) keeps TPU MXU results f32-faithful
        # (default bf16 passes drift ~3e-3 vs the reference's float64
        # oracle); these classifier convs are tiny, so the
        # bit-faithfulness contract wins the gate. The throughput-
        # critical encoder uses conv2d_strided (default precision), and
        # the opt-in bf16 training mode (cnn.conv_stack compute_dtype)
        # passes DEFAULT explicitly for single-pass MXU throughput.
        precision=lax.Precision.HIGHEST if precision is None else precision,
    )
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


def leaky_relu(x: jax.Array, alpha: float = 0.01) -> jax.Array:
    """LeakyReLU with the reference's z==0 -> alpha-branch tie semantics.

    ``jnp.where(x > 0, x, alpha*x)`` autodiffs to mask ``x>0 ? 1 : alpha``,
    matching the reference backward (Classes/CNNModel.py:310, :343).
    """
    return jnp.where(x > 0, x, alpha * x)


def conv2d_leaky(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    *,
    alpha: float = 0.01,
    padding: Literal["VALID", "SAME"] | int = "VALID",
) -> jax.Array:
    """Fused conv + bias + LeakyReLU (the reference `_conv_forward`)."""
    return leaky_relu(conv2d(x, kernel, bias, padding=padding), alpha)
