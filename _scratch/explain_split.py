"""Scratch: substage timing of explain + seg/classify stages."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import bench as B
from cadx_tpu.models import cnn, unet
from cadx_tpu.pipeline import fused
from cadx_tpu.ops.colormap import apply_jet
from cadx_tpu.ops.resize import resize_linear, resize_linear_mxu


def timeit(fn, *args, iters=10, passes=5):
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
    hw, batch = 256, 96
    config = fused.PipelineConfig(
        image_hw=(hw, hw), feature_hw=(32, 32),
        classifier=cnn.CNNConfig(
            input_shape=(32, 32, 64), num_classes=2,
            conv_layers=((128, 3), (64, 3)), hidden_units=(256, 128),
            dropout_rate=0.3,
        ),
    )
    params = fused.init_pipeline_params(jax.random.key(0), config)
    rng = np.random.default_rng(0)
    clean01 = jax.device_put(jnp.asarray(rng.random((batch, hw, hw), np.float32)))
    cam = jax.device_put(jnp.asarray(rng.random((batch, 32, 32), np.float32)))
    heat = jax.device_put(jnp.asarray(rng.integers(0, 255, (batch, hw, hw), np.uint8)))

    @jax.jit
    def enc_only(c):
        return unet.encoder_first_features(params.encoder, c[..., None]).sum()

    @jax.jit
    def rsz(c):
        feats = unet.encoder_first_features(params.encoder, c[..., None])
        return jax.vmap(lambda f: resize_linear(f, (32, 32)))(feats).sum()

    @jax.jit
    def cnn_fw(c):
        feats = unet.encoder_first_features(params.encoder, c[..., None])
        fs = jax.vmap(lambda f: resize_linear(f, (32, 32)))(feats)
        return cnn.forward(params.classifier, fs, config.classifier).sum()

    print(f"encoder conv1 only     : {timeit(enc_only, clean01):7.2f} ms")
    print(f"  + feat resize        : {timeit(rsz, clean01):7.2f} ms")
    print(f"  + cnn forward        : {timeit(cnn_fw, clean01):7.2f} ms")

    @jax.jit
    def cam_resize(cam):
        return resize_linear_mxu(cam, (hw, hw)).sum()

    @jax.jit
    def jet_only(heat):
        return apply_jet(heat).astype(jnp.float32).sum()

    @jax.jit
    def blend(heat, c):
        jet_rgb = (apply_jet(heat).astype(jnp.float32) / 255.0)[..., ::-1]
        img_rgb = jnp.repeat(c[..., None], 3, axis=-1)
        over = jet_rgb + img_rgb
        over = over / jnp.maximum(over.max(axis=(1, 2, 3), keepdims=True), 1e-7)
        return (over * 255).astype(jnp.uint8).astype(jnp.float32).sum()

    print(f"cam resize mxu (32->256): {timeit(cam_resize, cam):7.2f} ms")
    print(f"jet one-hot matmul      : {timeit(jet_only, heat):7.2f} ms")
    print(f"jet + blend + norm      : {timeit(blend, heat, clean01):7.2f} ms")

    # arithmetic jet check: does analytic formula match cv2 LUT exactly?
    import cv2
    lut = cv2.applyColorMap(np.arange(256, dtype=np.uint8).reshape(256, 1),
                            cv2.COLORMAP_JET).reshape(256, 3)
    x = np.linspace(0.0, 1.0, 256)

    def interp(v):
        return np.clip(1.5 - np.abs(4.0 * v), 0.0, 1.0)

    r = interp(x - 0.75)
    g = interp(x - 0.5)
    b = interp(x - 0.25)
    analytic = (np.stack([b, g, r], axis=-1) * 255.0 + 0.5).astype(np.uint8)
    diff = np.abs(analytic.astype(int) - lut.astype(int))
    print(f"analytic-vs-cv2 JET LUT: max diff {diff.max()}, n mismatched {np.count_nonzero(diff.any(axis=1))}")
    if diff.max() > 0:
        idx = np.argwhere(diff.any(axis=1)).ravel()[:10]
        for i in idx:
            print(i, lut[i], analytic[i])


if __name__ == "__main__":
    main()
