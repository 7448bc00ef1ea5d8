"""On-chip A/B: encoder 7x7/2 conv (cin=1) vs exact space-to-depth form.

VERDICT r4 item 7: is the 7x7/2 encoder conv MXU-shaped? The s2d form
rewrites it exactly (same dot products, regrouped): pad the kernel to
8x8 at the front, fold 2x2 pixel blocks into channels, and run a 4x4/1
conv with cin=4 and asymmetric pad (2,1) — contraction dim 49 -> 64,
stride eliminated. Measured per the r3 protocol: in-program fori
repetition (standalone micro-kernels are launch-bound), checksum fetch
at the end.

Run: cd /tmp && timeout 1200 python /root/repo/_scratch/conv_s2d_ab.py [cpu]
"""
import sys
import time

import numpy as np

if "cpu" in sys.argv[1:]:
    import jax
    jax.config.update("jax_platforms", "cpu")
import jax
import jax.numpy as jnp
from jax import lax


def conv_direct(x, k):
    return lax.conv_general_dilated(
        x, k, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def conv_s2d(x, k):
    # 2i+di-3 = 2(i+a-2)+b with di+1 = 2a+b  =>  K8[e]=K[e-1], K8[0]=0
    kc = k.shape[-1]
    k8 = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))
    k4 = k8.reshape(4, 2, 4, 2, 1, kc).transpose(
        0, 2, 1, 3, 4, 5).reshape(4, 4, 4, kc)
    b, h, w, _ = x.shape
    y = x.reshape(b, h // 2, 2, w // 2, 2).transpose(
        0, 1, 3, 2, 4).reshape(b, h // 2, w // 2, 4)
    return lax.conv_general_dilated(
        y, k4, (1, 1), [(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((96, 256, 256, 1)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((7, 7, 1, 64)), jnp.float32)

    a = np.asarray(jax.jit(conv_direct)(x, k))
    b = np.asarray(jax.jit(conv_s2d)(x, k))
    err = np.max(np.abs(a - b)) / max(np.max(np.abs(a)), 1e-9)
    print(f"shapes {a.shape} {b.shape}  rel_maxerr {err:.3e}")
    assert a.shape == b.shape and err < 1e-5, "s2d form is NOT equivalent"

    if "cpu" in sys.argv[1:]:
        print("cpu equivalence OK; skip timing")
        return

    reps = 50

    def timed(fn):
        def prog(x, k):
            def body(_, acc):
                return acc + fn(x, k)[:, ::64, ::64, :].sum()
            return lax.fori_loop(0, reps, body, 0.0)
        j = jax.jit(prog)
        j(x, k).block_until_ready()          # compile+warm
        outs = [j(x, k) for _ in range(5)]   # enqueue async
        t0 = time.perf_counter()
        outs2 = [j(x, k) for _ in range(5)]
        for o in outs2:
            o.block_until_ready()
        dt = time.perf_counter() - t0
        _ = [float(o) for o in outs]
        return dt / (5 * reps) * 1e3

    ms_direct = timed(conv_direct)
    ms_s2d = timed(conv_s2d)
    print(f"direct 7x7/2: {ms_direct:.4f} ms/96-batch")
    print(f"s2d 4x4/1  : {ms_s2d:.4f} ms/96-batch")
    print(f"speedup     : {ms_direct / ms_s2d:.3f}x")


if __name__ == "__main__":
    main()
