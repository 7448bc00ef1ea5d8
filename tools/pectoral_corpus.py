"""Corpus-level pectoral-removal parity evidence (round-5 verdict #6).

Runs the full cleaner front (suppress -> segment -> remove_pectoral)
over N parametrized synthetic mammograms (tests/synthetic_mammo.py)
with the REFERENCE'S OWN DMImagePreprocessor as oracle, and reports the
IoU distribution of the breast-only masks. The distribution backs the
test_cleaner.py bound: the only divergence source is watershed flood
tie-breaking (documented at preprocess/cleaner.py::remove_pectoral).

Usage: python tools/pectoral_corpus.py [N] [--out perf_history/...json]
Runs on CPU (forces jax_platforms=cpu — safe while the TPU tunnel is
busy or down; the stages compile once per shape and reuse).
"""

import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cadx_tpu.preprocess import cleaner  # noqa: E402

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
from synthetic_mammo import make_mammo  # noqa: E402

REF = "/root/reference/WebApplicationPrototype/customImageCleaner.py"


def _ref_preprocessor():
    spec = importlib.util.spec_from_file_location("ref_cleaner", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.DMImagePreprocessor()


def _iou(a, b):
    a, b = np.asarray(a) > 0, np.asarray(b) > 0
    return float((a & b).sum() / max((a | b).sum(), 1))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    out_path = "perf_history/pectoral_corpus.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    ref = _ref_preprocessor()

    ious, details = [], []
    skipped = 0
    t0 = time.time()
    for seed in range(n):
        img = make_mammo(seed)
        sup, mask = ref.suppress_artifacts(
            img, global_threshold=0.05, fill_holes=True,
            smooth_boundary=True)
        seg, _ = ref.segment_breast(sup, low_int_threshold=0.05, crop=False)
        ref_breast, _ = ref.remove_pectoral(
            seg, mask, high_int_threshold=0.8, morph_kn_size=3,
            n_morph_op=7, sm_kn_size=25)
        if (ref_breast > 0).sum() < 500:
            skipped += 1          # degenerate oracle output: not evidence
            continue
        res = cleaner.remove_pectoral(jnp.asarray(seg), jnp.asarray(mask),
                                      0.8, 3, 7, 25)
        iou = _iou(res.breast_only_mask, ref_breast > 0)
        ious.append(iou)
        details.append({"seed": seed, "iou": round(iou, 4)})

    ious_arr = np.array(ious)
    report = {
        "what": "pectoral remove_pectoral breast_only_mask IoU vs the "
                "reference DMImagePreprocessor over parametrized "
                "synthetic mammograms (tests/synthetic_mammo.py)",
        "n": len(ious),
        "skipped_degenerate_oracle": skipped,
        "iou_min": round(float(ious_arr.min()), 4),
        "iou_p05": round(float(np.percentile(ious_arr, 5)), 4),
        "iou_median": round(float(np.median(ious_arr)), 4),
        "iou_mean": round(float(ious_arr.mean()), 4),
        "iou_max": round(float(ious_arr.max()), 4),
        "below_0_95": int((ious_arr < 0.95).sum()),
        "below_0_90": int((ious_arr < 0.90).sum()),
        "wall_s": round(time.time() - t0, 1),
        "worst": sorted(details, key=lambda d: d["iou"])[:8],
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
