"""Pallas TPU kernels for the neural hot ops (SURVEY.md section 7 item 2).

Each kernel is a drop-in for its jax.lax reference implementation in
cadx_tpu.ops (the parity gate in tests/test_kernels.py), VMEM-resident
per grid program:

- conv2d_leaky: fused VALID 3x3-style conv + bias + LeakyReLU. The conv
  is expressed as k*k shifted (H*W, Cin) @ (Cin, F) matmuls on the MXU —
  no im2col materialization.
- max_pool_ties / avg_pool: 2x2 (or kxk) window reductions via reshape.
- upsample_nearest: broadcast-reshape.
- batchnorm: inference-form normalize-scale-shift.
- gradcam_tail: the north-star "activation x gradient -> upsample ->
  overlay" fusion: CAM weights (GAP of grads) -> relu CAM -> min-max
  normalize -> bilinear upsample -> JET (one-hot matmul vs the LUT) ->
  show_cam_on_image blend, one kernel launch per image.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# fused conv + bias + LeakyReLU
# ---------------------------------------------------------------------------

def _conv_leaky_kernel(x_ref, w_ref, b_ref, o_ref, *, k: int, alpha: float,
                       oh: int, ow: int):
    # x: (1, H, W, C); w: (k, k, C, F); out: (1, oh, ow, F)
    c = x_ref.shape[3]
    f = w_ref.shape[3]
    acc = jnp.zeros((oh * ow, f), jnp.float32)
    for di in range(k):
        for dj in range(k):
            patch = x_ref[0, di : di + oh, dj : dj + ow, :]
            # HIGHEST: the Mosaic MXU dot otherwise truncates f32 inputs
            # to bf16 (compiled-on-chip parity vs lax.conv fails at ~6e-3;
            # interpret mode never sees it)
            acc = acc + jnp.dot(
                patch.reshape(oh * ow, c), w_ref[di, dj],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
    z = acc.reshape(oh, ow, f) + b_ref[:]
    o_ref[0] = jnp.where(z > 0, z, alpha * z)


@functools.partial(jax.jit, static_argnames=("alpha", "interpret"))
def conv2d_leaky_pallas(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                        alpha: float = 0.01, interpret: bool = False) -> jax.Array:
    """Fused VALID conv+bias+LeakyReLU. x: (B,H,W,C), kernel: (k,k,C,F)."""
    b, h, w, c = x.shape
    k = kernel.shape[0]
    f = kernel.shape[3]
    oh, ow = h - k + 1, w - k + 1
    return pl.pallas_call(
        functools.partial(_conv_leaky_kernel, k=k, alpha=alpha, oh=oh, ow=ow),
        out_shape=jax.ShapeDtypeStruct((b, oh, ow, f), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, oh, ow, f), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x.astype(jnp.float32), kernel.astype(jnp.float32), bias.astype(jnp.float32))


# ---------------------------------------------------------------------------
# pooling / upsample / batchnorm
# ---------------------------------------------------------------------------

def _pool_kernel(x_ref, o_ref, *, size: int, mode: str):
    _, h, w, c = x_ref.shape
    oh, ow = h // size, w // size
    xr = x_ref[0, : oh * size, : ow * size, :].reshape(oh, size, ow, size, c)
    o_ref[0] = xr.max(axis=(1, 3)) if mode == "max" else xr.mean(axis=(1, 3))


def _pool_pallas(x, size, mode, interpret):
    b, h, w, c = x.shape
    oh, ow = h // size, w // size
    return pl.pallas_call(
        functools.partial(_pool_kernel, size=size, mode=mode),
        out_shape=jax.ShapeDtypeStruct((b, oh, ow, c), x.dtype),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, oh, ow, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)


@functools.partial(jax.jit, static_argnames=("size", "interpret"))
def max_pool_pallas(x: jax.Array, size: int = 2, interpret: bool = False):
    """Forward of the tie-semantics max pool (backward stays the custom
    VJP in ops.pool — gradients never flow through this inference path)."""
    return _pool_pallas(x, size, "max", interpret)


@functools.partial(jax.jit, static_argnames=("size", "interpret"))
def avg_pool_pallas(x: jax.Array, size: int = 3, interpret: bool = False):
    return _pool_pallas(x, size, "mean", interpret)


def _upsample_kernel(x_ref, o_ref, *, factor: int):
    _, h, w, c = x_ref.shape
    x = x_ref[0]
    x = jnp.broadcast_to(x[:, None, :, None, :], (h, factor, w, factor, c))
    o_ref[0] = x.reshape(h * factor, w * factor, c)


@functools.partial(jax.jit, static_argnames=("factor", "interpret"))
def upsample_nearest_pallas(x: jax.Array, factor: int = 2,
                            interpret: bool = False):
    b, h, w, c = x.shape
    return pl.pallas_call(
        functools.partial(_upsample_kernel, factor=factor),
        out_shape=jax.ShapeDtypeStruct((b, h * factor, w * factor, c), x.dtype),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h * factor, w * factor, c),
                               lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)


def _bn_kernel(x_ref, scale_ref, bias_ref, mean_ref, var_ref, o_ref, *, eps):
    inv = lax.rsqrt(var_ref[:] + eps)
    o_ref[0] = (x_ref[0] - mean_ref[:]) * inv * scale_ref[:] + bias_ref[:]


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def batchnorm_pallas(x: jax.Array, scale, bias, mean, var, eps: float = 1e-5,
                     interpret: bool = False):
    """Inference batchnorm (models.unet._bn_apply equivalent)."""
    b, h, w, c = x.shape
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    img = pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bn_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        grid=(b,),
        in_specs=[img, vec, vec, vec, vec],
        out_specs=img,
        interpret=interpret,
    )(x.astype(jnp.float32), scale, bias, mean, var)


# ---------------------------------------------------------------------------
# fused Grad-CAM tail
# ---------------------------------------------------------------------------

def _gradcam_tail_kernel(acts_ref, grads_ref, img_ref, lut_ref,
                         overlay_ref, heat_ref, blend_scratch, *,
                         oh: int, ow: int):
    # acts/grads: (1, h, w, F); img: (1, oh, ow) float01; lut: (256, 3) RGB
    _, h, w, f = acts_ref.shape
    weights = grads_ref[0].reshape(h * w, f).mean(axis=0)          # GAP
    cam = jnp.maximum((acts_ref[0] * weights).sum(axis=-1), 0.0)   # (h, w)
    lo = cam.min()
    hi = cam.max()
    cam = (cam - lo) / (hi - lo + 1e-7)

    # bilinear upsample (h,w) -> (oh,ow), half-pixel centers like
    # jax.image.resize(method="linear"). Bilinear is separable, so build
    # tiny interpolation matrices and do cam_up = R @ cam @ C^T — no
    # per-pixel one-hots (those pad to 128 lanes and blow VMEM).
    def interp_matrix(n_out: int, n_in: int):
        i = lax.broadcasted_iota(jnp.int32, (n_out, 1), 0).astype(jnp.float32)
        r = jnp.clip((i + 0.5) * (n_in / n_out) - 0.5, 0.0, n_in - 1.0)
        lo = jnp.floor(r)
        frac = r - lo                                   # (n_out, 1)
        lo_i = lo.astype(jnp.int32)[:, 0]
        hi_i = jnp.minimum(lo_i + 1, n_in - 1)
        m = (jax.nn.one_hot(lo_i, n_in, dtype=jnp.float32) * (1.0 - frac)
             + jax.nn.one_hot(hi_i, n_in, dtype=jnp.float32) * frac)
        return m                                        # (n_out, n_in)

    R = interp_matrix(oh, h)                            # (oh, h)
    Ct = interp_matrix(ow, w)                           # (ow, w)
    cam_up = jnp.dot(jnp.dot(R, cam, preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST),
                     Ct.T, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    cam_up = jnp.clip(cam_up, 0.0, 1.0)
    # TRUNCATE like the production tail's (x*255).astype(uint8)
    # (pipeline/fused.py heat_u8) — rounding here would shift ~half of
    # all heat pixels one JET bin (integer-slope ramps => channel
    # deltas ~4), breaking drop-in bit parity
    heat_u8 = jnp.floor(cam_up * 255.0)
    heat_ref[0] = heat_u8.astype(jnp.int32)

    # JET lookup as a per-bin accumulation entirely on (oh, ow) planes:
    # channel-last or one-hot formulations lane-pad/materialize tens of MB
    # in VMEM; a fori_loop over the 256 LUT bins keeps a constant ~1MB
    # footprint (3 accumulator planes + one compare mask).
    idx_all = heat_u8.astype(jnp.int32)

    def bin_body(bval, accs):
        m = (idx_all == bval).astype(jnp.float32)
        # dynamic REF slice (value-space dynamic_slice has no Mosaic lowering)
        row = lut_ref[pl.ds(bval, 1), :]                  # (1, 3)
        return (accs[0] + m * row[0, 0],
                accs[1] + m * row[0, 1],
                accs[2] + m * row[0, 2])

    zero = jnp.zeros((oh, ow), jnp.float32)
    jr, jg, jb = lax.fori_loop(0, 256, bin_body, (zero, zero, zero))

    img = img_ref[0]
    blended_max = jnp.float32(1e-7)
    for c, jet_c in enumerate((jr, jg, jb)):
        b_c = jnp.round(jet_c) / 255.0 + img
        blend_scratch[c] = b_c
        blended_max = jnp.maximum(blended_max, b_c.max())
    for c in range(3):
        # truncate, matching fused.py's (over * 255).astype(uint8)
        overlay_ref[0, c] = jnp.floor(
            blend_scratch[c] / blended_max * 255.0).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("out_hw", "interpret"))
def gradcam_tail_pallas(acts: jax.Array, grads: jax.Array, img01: jax.Array,
                        out_hw: tuple[int, int], interpret: bool = False):
    """Fused CAM tail per image. acts/grads: (B,h,w,F); img01: (B,oh,ow)
    in [0,1]. Returns (overlay_rgb uint8 (B,oh,ow,3), heatmap uint8)."""
    from cadx_tpu.ops.colormap import jet_lut_bgr

    b, h, w, f = acts.shape
    oh, ow = out_hw
    lut_rgb = jnp.asarray(jet_lut_bgr()[:, ::-1].copy(), jnp.float32)
    img_spec = pl.BlockSpec((1, oh, ow), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    feat_spec = pl.BlockSpec((1, h, w, f), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    # channel-FIRST overlay: (1, 3, oh, ow) keeps the lane dim at ow
    # (channel-last would pad 3 -> 128 lanes: 33MB per image in VMEM)
    ov_spec = pl.BlockSpec((1, 3, oh, ow), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    overlay_cf, heat = pl.pallas_call(
        functools.partial(_gradcam_tail_kernel, oh=oh, ow=ow),
        out_shape=(jax.ShapeDtypeStruct((b, 3, oh, ow), jnp.int32),
                   jax.ShapeDtypeStruct((b, oh, ow), jnp.int32)),
        grid=(b,),
        in_specs=[feat_spec, feat_spec, img_spec,
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(ov_spec, img_spec),
        scratch_shapes=[pltpu.VMEM((3, oh, ow), jnp.float32)],
        interpret=interpret,
    )(acts.astype(jnp.float32), grads.astype(jnp.float32),
      img01.astype(jnp.float32), lut_rgb)
    overlay = jnp.transpose(overlay_cf, (0, 2, 3, 1))
    return overlay.astype(jnp.uint8), heat.astype(jnp.uint8)
