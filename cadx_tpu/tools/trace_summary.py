"""Summarize a jax.profiler trace into a per-program device-time table.

The round-3 perf work was driven by exactly this view (which XLA/Pallas
program owns the device time), extracted by hand from the Chrome-trace
JSON the profiler writes; this tool makes it a one-command report so
future kernel work starts from evidence, not guesses:

    CADX_BENCH_TRACE=/tmp/cadx_trace python bench.py
    python -m cadx_tpu.tools.trace_summary /tmp/cadx_trace

No TensorBoard/xprof needed — reads the vm.trace.json.gz Chrome trace
(the .xplane.pb needs protos this image doesn't ship).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import sys


def summarize(
    trace_dir: str, top: int = 25
) -> tuple[list[tuple[str, float, int]], float]:
    """([(event name, total device ms, count)] sorted by total time,
    total device ms across ALL programs — not just the top-N shown)."""
    paths = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    if not paths:
        raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1]) as f:  # latest capture
        d = json.load(f)
    evs = d["traceEvents"]
    pid_names = {e["pid"]: e["args"]["name"] for e in evs
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    tot: collections.Counter = collections.Counter()
    cnt: collections.Counter = collections.Counter()
    for e in evs:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e["pid"], "")
        if "TPU" not in pname and "device" not in pname.lower():
            continue
        tot[e["name"]] += e.get("dur", 0)
        cnt[e["name"]] += 1
    total_ms = sum(tot.values()) / 1000.0
    return ([(name, us / 1000.0, cnt[name]) for name, us in tot.most_common(top)],
            total_ms)


def main(argv: list[str]) -> int:
    if len(argv) != 2:
        print(__doc__)
        return 2
    rows, total = summarize(argv[1])
    # percent of TOTAL device time (all programs), not of the top-N sum —
    # else every row's share is overstated when the tail is long
    shown = sum(ms for _, ms, _ in rows)
    print(f"{'device ms':>10}  {'%':>5}  {'count':>5}  program")
    for name, ms, n in rows:
        print(f"{ms:10.2f}  {100 * ms / max(total, 1e-9):5.1f}  {n:5d}  {name[:90]}")
    if total > shown:
        print(f"{total - shown:10.2f}  {100 * (total - shown) / total:5.1f}  "
              f"{'':>5}  (other programs below top-{len(rows)})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
