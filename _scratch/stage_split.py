"""Scratch: per-stage timing of the fused pipeline on the real TPU."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import bench as B
from cadx_tpu.models import cnn, unet
from cadx_tpu.pipeline import fused
from cadx_tpu.preprocess import cleaner
from cadx_tpu.ops.resize import resize_linear


def timeit(fn, *args, iters=10, passes=5):
    # warmup/compile
    float(fn(*args))
    ms = []
    for _ in range(passes):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        total = float(jnp.stack(outs).sum())
        assert np.isfinite(total)
        ms.append((time.perf_counter() - t0) / iters * 1000)
    ms.sort()
    return ms[len(ms) // 2]


def main():
    hw = 256
    batch = 96
    config = fused.PipelineConfig(
        image_hw=(hw, hw), feature_hw=(32, 32),
        classifier=cnn.CNNConfig(
            input_shape=(32, 32, 64), num_classes=2,
            conv_layers=((128, 3), (64, 3)), hidden_units=(256, 128),
            dropout_rate=0.3,
        ),
    )
    params = fused.init_pipeline_params(jax.random.key(0), config)
    x = jax.device_put(jnp.asarray(B.synthetic_mammograms(batch, hw)))

    @jax.jit
    def clean_only(x):
        return jax.vmap(cleaner.clean_boundary_gray)(x).sum()

    clean01 = jax.jit(jax.vmap(cleaner.clean_boundary_gray))(x) / 255.0
    clean01 = jax.device_put(clean01)

    @jax.jit
    def seg_cls(clean01):
        feats = unet.encoder_first_features(params.encoder, clean01[..., None])
        fs = jax.vmap(lambda f: resize_linear(f, config.feature_hw))(feats)
        probs = cnn.forward(params.classifier, fs, config.classifier)
        return probs.sum() + fs.sum() / 1e3

    @jax.jit
    def explain_only(clean01):
        from cadx_tpu.xai.gradcam import conv_features, head_logits
        feats = unet.encoder_first_features(params.encoder, clean01[..., None])
        fs = jax.vmap(lambda f: resize_linear(f, config.feature_hw))(feats)
        acts = conv_features(params.classifier, fs, config.classifier)
        _, vjp_fn = jax.vjp(
            lambda f: head_logits(params.classifier, f, config.classifier), acts)
        s = 0.0
        for ci in config.classes_to_explain:
            ov, hm = fused._gradcam_tail(acts, vjp_fn, clean01, ci, config)
            s = s + ov.astype(jnp.float32).sum() / 1e6
        return s

    full = timeit(lambda: fused.run_pipeline_checksum(params, x, config))
    cl = timeit(lambda: clean_only(x))
    sc = timeit(lambda: seg_cls(clean01))
    ex = timeit(lambda: explain_only(clean01))
    print(f"full        : {full:7.2f} ms")
    print(f"clean       : {cl:7.2f} ms")
    print(f"seg+classify: {sc:7.2f} ms")
    print(f"explain(+sc): {ex:7.2f} ms")

    # --- substage: the individual cleaner pieces, batched ---
    raw8 = x  # already uint8
    from cadx_tpu.kernels.largest_obj import largest_obj_pallas
    from cadx_tpu.kernels.pectoral import pectoral_tail_pallas
    from cadx_tpu.kernels.equalize import equalize_hist_pallas

    fg = jax.device_put(raw8 > 12)

    t = timeit(lambda: largest_obj_pallas(fg, 8, fill=True, smooth_k=15).sum())
    print(f"largest_obj (suppress form) : {t:7.2f} ms")
    t = timeit(lambda: largest_obj_pallas(fg, 8, fill_first=True).sum())
    print(f"largest_obj (fill_first)    : {t:7.2f} ms")
    t = timeit(lambda: equalize_hist_pallas(raw8).astype(jnp.float32).sum())
    print(f"equalize kernel             : {t:7.2f} ms")
    equ = jax.device_put(jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (batch, hw, hw), np.int32)))
    binm = jax.device_put((equ > 200).astype(jnp.int32))
    bm = jax.device_put((raw8 > 5).astype(jnp.int32) * 255)
    def pect():
        l, b_, m = pectoral_tail_pallas(equ, binm, bm, 3, 7, 25)
        return l.sum() + m.astype(jnp.float32).sum()
    t = timeit(pect)
    print(f"pectoral tail kernel        : {t:7.2f} ms")

    # trivial pallas launch overhead probe: a do-nothing-ish kernel per image
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _nop_kernel(x_ref, o_ref):
        o_ref[0] = x_ref[0] + 1

    @jax.jit
    def nop(xs):
        spec = pl.BlockSpec((1, hw, hw), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            _nop_kernel,
            out_shape=jax.ShapeDtypeStruct((batch, hw, hw), jnp.int32),
            grid=(batch,), in_specs=[spec], out_specs=spec,
        )(xs.astype(jnp.int32))
        return out.sum()

    t = timeit(lambda: nop(raw8))
    print(f"nop kernel grid=96          : {t:7.2f} ms")

    def _nop_kernel2(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1

    @jax.jit
    def nop_g2(xs):
        spec = pl.BlockSpec((2, hw, hw), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            _nop_kernel2,
            out_shape=jax.ShapeDtypeStruct((batch, hw, hw), jnp.int32),
            grid=(batch // 2,), in_specs=[spec], out_specs=spec,
        )(xs.astype(jnp.int32))
        return out.sum()

    t = timeit(lambda: nop_g2(raw8))
    print(f"nop kernel grid=48 (G=2)    : {t:7.2f} ms")


if __name__ == "__main__":
    main()
