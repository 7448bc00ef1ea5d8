"""CPU probe: ACTUAL watershed convergence sweep counts per max_scan, and
CCL iteration counts, on realistic pectoral inputs (bench synthetic
mammograms through the real cleaner front). Data for tuning the
max_iters/ws_max_iters/max_scan caps (bench_v6 shows the pectoral tail
dominates the clean stage).

Run: cd /root/repo && JAX_PLATFORMS=cpu python _scratch/sweep_counts.py
"""
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

sys.path.insert(0, "/root/repo")
from bench import synthetic_mammograms  # noqa: E402

from cadx_tpu.preprocess import cleaner  # noqa: E402
from cadx_tpu.ops import geodesic_scan as G  # noqa: E402
from cadx_tpu.ops.watershed import _shift  # noqa: E402


def relax_count(img, markers, max_iters, max_scan):
    """relax_to_fixpoint, but returns (labels, iterations-to-converge)."""
    dist0 = jnp.where(markers > 0, 0.0, G.BIG)
    srow, scol = G.axis_costs(_shift, img)

    def body(state):
        labels, dist, _, it = state
        new_d, new_l = G.sweep(_shift, dist, labels, srow, scol, max_scan)
        return new_l, new_d, jnp.any(new_d != dist), it + 1

    def cond(state):
        _, _, changed, it = state
        return changed & (it < max_iters)

    labels, _, _, it = lax.while_loop(
        cond, body, (markers, dist0, jnp.bool_(True), jnp.int32(0)))
    return labels, it


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    x = jnp.asarray(synthetic_mammograms(n, 256))

    @jax.jit
    def front(x):
        def one(im):
            raw8 = cleaner.to_uint8(im)
            s, bm = cleaner.suppress_artifacts(raw8, 0.05, 15)
            bo, _ = cleaner.segment_breast_mask(s, 0.05)
            img = bo.astype(jnp.uint8)
            equ = cleaner.equalize_hist(img)
            th = cleaner.relative_threshold_value(img, 0.8)
            binm = cleaner.binary_threshold(equ, th, 255)
            return equ, binm, bm
        return jax.vmap(one)(x)

    equ, binm, breast = front(x)

    # markers exactly as remove_pectoral builds them (XLA path)
    def markers_one(e, b, bm):
        pm = cleaner.select_largest_obj(b, 255, fill_holes_=True,
                                        smooth_boundary=False)
        er = cleaner.erode(pm, 3, 7)
        di = cleaner.dilate(pm, 3, 7)
        mk = jnp.zeros(e.shape, jnp.int32)
        mk = jnp.where(er > 0, 255, mk)
        mk = jnp.where(di == 0, 128, mk)
        mk = jnp.where(bm == 0, 64, mk)
        return mk

    mk = jax.jit(jax.vmap(markers_one))(equ, binm, breast)

    base_labels = None
    for max_scan in (8, 16, 32, 64, 256):
        f = jax.jit(jax.vmap(
            lambda e, m: relax_count(e.astype(jnp.float32), m, 128, max_scan)),
            static_argnums=())
        labels, its = jax.block_until_ready(f(equ, mk))
        its = np.asarray(its)
        if base_labels is None:
            base_labels = labels
        same = bool((labels == base_labels).all())
        print(f"max_scan={max_scan:4d}: sweeps min/median/max = "
              f"{its.min()}/{int(np.median(its))}/{its.max()}  "
              f"labels==scan8: {same}", flush=True)


if __name__ == "__main__":
    main()
