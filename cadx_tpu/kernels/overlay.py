"""Pallas TPU kernel: JET colormap + show_cam_on_image blend, VMEM-resident.

The Grad-CAM tail's hot spot is the 256-color JET lookup: the XLA
one-hot-matmul form (ops.colormap.apply_jet) costs ~8ms/128-batch per
explained class at 256x256 — the (N, 256) one-hot materializes through
HBM. Same recipe as kernels/equalize.py: the heatmap arrives flattened
to (1, N) (XLA reshape outside — Mosaic can't reshape tiled dims), and
a fori over lane chunks compares all 256 bins at once as a 2D
broadcast, weighting by the R/G/B LUT columns. The blend
(jet/255 + gray, joint max-normalize, *255 truncate) matches
pipeline.fused._gradcam_tail's float ops exactly — bit-identical
overlays.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _jet_blend_kernel(heat_ref, img_ref, lut_ref, out_ref, blend_ref, *,
                      chunk: int):
    n = heat_ref.shape[2]
    bins = lax.broadcasted_iota(jnp.int32, (256, 1), 0)
    n_chunks = n // chunk

    # phase 1: jet lookup + add gray; track the running blended max
    def body(t, vmax):
        sl = pl.ds(t * chunk, chunk)
        hx = heat_ref[0, :, sl]                      # (1, chunk) int32
        gray = img_ref[0, :, sl]                     # (1, chunk) float01
        cmp = hx == bins                             # (256, chunk)
        for c in range(3):
            lut_c = lut_ref[:, pl.ds(c, 1)].astype(jnp.float32)  # (256,1)
            jet_c = jnp.where(cmp, lut_c, 0.0).sum(axis=0, keepdims=True)
            blended = jnp.round(jet_c) / 255.0 + gray
            blend_ref[pl.ds(c, 1), sl] = blended
            vmax = jnp.maximum(vmax, blended.max())
        return vmax

    vmax = lax.fori_loop(0, n_chunks, body, jnp.float32(1e-7))

    # phase 2: joint max-normalize, *255, truncate (matches
    # (over / max(over)) * 255 -> astype(uint8) in fused._gradcam_tail)
    def norm_body(t, _):
        sl = pl.ds(t * chunk, chunk)
        out_ref[0, :, sl] = (blend_ref[:, sl] / vmax * 255.0).astype(jnp.int32)
        return 0

    lax.fori_loop(0, n_chunks, norm_body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def jet_blend_pallas(heat_u8: jax.Array, img01: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """Batched: heat (B, H, W) uint8 CAM + img01 (B, H, W) float gray
    -> (B, H, W, 3) uint8 RGB overlay (show_cam_on_image semantics, the
    fused pipeline's jet+blend+normalize)."""
    from cadx_tpu.ops.colormap import jet_lut_bgr

    b, h, w = heat_u8.shape
    n = h * w
    chunk = 4096
    while n % chunk:
        chunk //= 2
    lut_rgb = jnp.asarray(jet_lut_bgr()[:, ::-1].copy(), jnp.int32)  # (256,3)
    flat_spec = pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 3, n), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_jet_blend_kernel, chunk=chunk),
        out_shape=jax.ShapeDtypeStruct((b, 3, n), jnp.int32),
        grid=(b,),
        in_specs=[flat_spec, flat_spec,
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((3, n), jnp.float32)],
        interpret=interpret,
    )(heat_u8.astype(jnp.int32).reshape(b, 1, n),
      img01.astype(jnp.float32).reshape(b, 1, n), lut_rgb)
    return out.reshape(b, 3, h, w).transpose(0, 2, 3, 1).astype(jnp.uint8)
