"""On-chip A/B for the pectoral tail (the clean stage's dominant sub-stage:
9.48ms/96-batch increment, perf_history/bench_v6_stage_detail.json).

Times pectoral_tail_pallas variants over realistic inputs (the bench's
synthetic mammograms run through the REAL cleaner front), using the
enqueue-N/fetch-once method (CLAUDE.md tunnel timing). Variants share the
same harness so the ~3ms dispatch floor cancels in comparison.

Also reports ACTUAL convergence sweep counts (watershed while_loop
iterations) per max_scan from the instrumented XLA path, so the
max_iters/max_scan caps can be tuned from data instead of guesses.

Run: cd /root/repo && timeout 1800 python _scratch/pectoral_ab.py
"""
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import synthetic_mammograms  # noqa: E402

from cadx_tpu.preprocess import cleaner  # noqa: E402
from cadx_tpu.kernels.pectoral import pectoral_tail_pallas  # noqa: E402


@jax.jit
def front(x):
    def one(im):
        raw8 = cleaner.to_uint8(im)
        img_suppr, breast_mask = cleaner.suppress_artifacts(raw8, 0.05, 15)
        img_breast_only, _ = cleaner.segment_breast_mask(img_suppr, 0.05)
        img = img_breast_only.astype(jnp.uint8)
        img_equ = cleaner.equalize_hist(img)
        high_th = cleaner.relative_threshold_value(img, 0.8)
        img_bin = cleaner.binary_threshold(img_equ, high_th, 255)
        return img_equ, img_bin, breast_mask
    return jax.vmap(one)(x)


def timed(fn, n=10, passes=5):
    """bench.py's method: enqueue n async calls, fetch ONE stacked scalar
    (block_until_ready under-reports on the tunneled runtime)."""
    float(fn())  # compile + warm
    all_ms = []
    for _ in range(passes):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(n)]
        total = float(jnp.stack(outs).sum())
        assert np.isfinite(total)
        all_ms.append((time.perf_counter() - t0) / n * 1e3)
    return float(np.median(all_ms))


def main():
    x = jnp.asarray(synthetic_mammograms(96, 256))
    equ, binm, breast = jax.block_until_ready(front(x))

    results = {}

    def variant(name, **kw):
        @jax.jit
        def run(e, b, m):
            lab, bd, msk = pectoral_tail_pallas(e, b, m, 3, 7, 25, **kw)
            return lab.sum() + bd.sum() + msk.sum()
        ms = timed(lambda: run(equ, binm, breast))
        results[name] = round(ms, 2)
        print(f"{name}: {ms:.2f} ms/96-batch", file=sys.stderr, flush=True)

    variant("baseline_scan32", max_iters=128, ws_max_iters=256, max_scan=32)
    variant("scan16", max_iters=128, ws_max_iters=256, max_scan=16)
    variant("scan64", max_iters=128, ws_max_iters=256, max_scan=64)
    variant("scan8", max_iters=128, ws_max_iters=256, max_scan=8)

    # parity of the variants on this data (fixpoint is exact for any cap)
    def full(e, b, m, s):
        lab, bd, msk = pectoral_tail_pallas(e, b, m, 3, 7, 25, max_scan=s)
        return lab, bd, msk
    base = jax.block_until_ready(full(equ, binm, breast, 32))
    for s in (8, 16, 64):
        got = full(equ, binm, breast, s)
        same = all(bool((g == b).all()) for g, b in zip(got, base))
        results[f"parity_scan{s}"] = same
        print(f"parity scan{s} == scan32: {same}", file=sys.stderr, flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
