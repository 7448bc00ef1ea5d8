"""Headline benchmark: fused preproc+segment+classify+Grad-CAM pipeline.

Measures end-to-end images/sec/chip at 256x256 on the real TPU (the
BASELINE.json metric; reference publishes no throughput, so vs_baseline
is against the 1000 img/s/chip target). Prints ONE JSON line.

Timing methodology (variance-aware since round 2): the tunneled runtime
shows rare 30-90ms dispatch stalls that polluted single-run averages
(round-1 driver captured 1253 img/s vs 1600 steady-state). The
throughput measurement therefore runs R independent passes of N
enqueued iterations each and reports the MEDIAN pass; since round 3
EVERY pass is logged (`all_pass_ms`) so outliers are visible, and
single-image latency is sampled 50x for p50/p95/p99.

Per-stage split (round 3): separate checksummed programs for the clean
stage and the encode+classify stage, plus the full program; the explain
cost is the full-minus-others residual. Every standalone measurement
carries the same per-call dispatch floor, reported as `floor_ms`
(a trivial program timed identically) — subtract it when comparing
stages, not when comparing full-pipeline numbers.

A second metric block benchmarks the SERVING resolution: the engine's
single-image 512x512 path (clean at native res -> 512 INTER_AREA ->
encoder conv1 -> feature resize -> classify -> CAM), the program behind
/upload-single + /classify (reference app.py:96-150, :492-606).

Utilization: est_mfu / est_membw_util are analytic FLOP and HBM-byte
counts for the pipeline's dominant ops divided by the measured time
against v5e peak (197 TFLOP/s bf16 / 394 GB/s HBM; f32 MXU ~49 TFLOP/s).
"""

import json
import subprocess
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def _tunnel_preflight(attempts: int = 6, probe_timeout_s: int = 60,
                      retry_sleep_s: int = 90) -> bool:
    """The axon TPU tunnel can wedge so hard that jax.devices() blocks
    forever (observed r3: no local relay listening, every probe hangs).
    Probe it in a SUBPROCESS with a hard timeout — an in-process hang
    could not be interrupted — retrying for up to ~13.5 min worst case
    (6 x 60s probes + 5 x 90s sleeps), so an outage surfaces as an
    explicit failure JSON instead of an eternally hanging benchmark
    run. Skipped when not targeting the tunnel."""
    import os

    plats = [p.strip() for p in
             os.environ.get("JAX_PLATFORMS", "axon").split(",") if p.strip()]
    if not plats or plats[0] != "axon":
        return True  # not targeting the tunnel
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices(); print('ok')"],
                timeout=probe_timeout_s, capture_output=True, text=True)
            if r.returncode == 0 and "ok" in r.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        if i + 1 < attempts:
            print(f"bench: TPU tunnel probe {i + 1}/{attempts} failed; "
                  f"retrying in {retry_sleep_s}s", file=sys.stderr)
            time.sleep(retry_sleep_s)
    return False


def synthetic_mammograms(batch: int, hw: int, seed: int = 0) -> np.ndarray:
    """Textured breast + bright pectoral wedge + artifacts, uint8."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:hw, 0:hw]
    out = np.zeros((batch, hw, hw), np.uint8)
    for i in range(batch):
        cx = hw - 1
        r = hw // 2
        breast = ((xx - cx) ** 2 + (yy - hw // 2) ** 2) < r * r
        tissue = (110 + rng.normal(0, 25, (hw, hw))).clip(40, 185).astype(np.uint8)
        img = np.zeros((hw, hw), np.uint8)
        img[breast] = tissue[breast]
        wedge = ((hw - 1 - xx) + yy) < hw // 4
        img[wedge] = np.maximum(img[wedge], 230)
        ay, ax_ = rng.integers(0, hw // 2), rng.integers(0, hw // 4)
        img[ay : ay + 6, ax_ : ax_ + 6] = 255
        out[i] = img
    return out


def _estimate_flops_bytes(batch: int, hw: int, config) -> tuple[float, float]:
    """Analytic per-batch FLOPs and HBM bytes for the dominant stages.

    Counted: encoder conv1 (7x7/2, 1->64ch), classifier convs + dense,
    Grad-CAM vjp (~2x classifier conv cost), and one HBM round-trip for
    each major (B,H,W)-sized plane the XLA program cannot keep fused
    (cleaner relaxation state, display image, overlays). Deliberately a
    LOWER bound on work / traffic — utilization numbers are ceilings.
    """
    b = batch
    h = w = hw
    conv1_flops = b * (h // 2) * (w // 2) * 64 * 7 * 7 * 2
    fh, fw = config.feature_hw
    cin = config.classifier.input_shape[-1]
    conv_flops = 0
    hh, ww = fh, fw
    for (f, k) in config.classifier.conv_layers:
        conv_flops += b * hh * ww * f * cin * k * k * 2
        cin = f
        hh, ww = hh // 2, ww // 2
    dense_in = hh * ww * cin
    dense_flops = 0
    for u in config.classifier.hidden_units:
        dense_flops += b * dense_in * u * 2
        dense_in = u
    dense_flops += b * dense_in * config.classifier.num_classes * 2
    xai_flops = 2 * conv_flops * len(config.classes_to_explain)
    flops = conv1_flops + conv_flops + dense_flops + xai_flops

    plane = b * h * w * 4
    bytes_ = (
        6 * 5 * plane
        + 2 * plane
        + b * (h // 2) * (w // 2) * 64 * 4
        + len(config.classes_to_explain) * b * h * w * (3 + 1)
    )
    return float(flops), float(bytes_)


def _median_pass_ms(fn, iters=10, passes=5):
    """Enqueue `iters` async calls per pass, fetch one scalar at the end
    (per-iteration host syncs would add the tunnel's ~25ms round trip).
    Returns (median_ms_per_iter, all_pass_ms sorted chronologically)."""
    float(fn())  # compile + warmup
    all_ms = []
    for _ in range(passes):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(iters)]
        total = float(jnp.stack(outs).sum())
        assert np.isfinite(total)
        all_ms.append((time.perf_counter() - t0) / iters * 1000)
    return float(np.median(all_ms)), all_ms


def _latency_ms(fn, n=50):
    """Per-call wall latency (one host round trip each): p50/p95/p99.
    Three warmup calls: the first 1-2 dispatches after a fresh compile
    can hit the tunnel's one-time stall (see all_pass_ms), which would
    pollute the p99 of a 30-50 sample run."""
    for _ in range(3):
        float(fn())
    lat = []
    for _ in range(n):
        t1 = time.perf_counter()
        float(fn())
        lat.append((time.perf_counter() - t1) * 1000)
    lat = np.asarray(lat)
    return (float(np.percentile(lat, 50)), float(np.percentile(lat, 95)),
            float(np.percentile(lat, 99)))


_TRANSIENT_MARKERS = (
    # transport-layer flakes on the tunneled remote-compile/execute path —
    # retryable, NOT evidence of a Mosaic lowering bug (r4: one such flake
    # permanently disabled every Pallas kernel and published 493 img/s
    # XLA-fallback numbers as the driver capture)
    "remote_compile", "read body", "response body closed",
    "timed out", "timeout", "deadline", "unavailable",
    "connection reset", "connection refused", "broken pipe",
    "eof", "socket", "temporarily",
)


def _is_transient(e: BaseException) -> bool:
    msg = repr(e).lower()
    return any(m in msg for m in _TRANSIENT_MARKERS)


def _compile_cache_info() -> dict:
    """The persistent compilation cache is enabled by importing cadx_tpu
    (cadx_tpu/__init__.py::_enable_compilation_cache — every >=2s compile,
    including every remote Mosaic compile, is cached by HLO key; verified
    cross-process on the axon tunnel 2026-08-19: a warm run recompiles
    nothing and a transient-flake retry re-pays only the flaked program).
    Reported in the bench JSON so a driver capture carries the evidence."""
    import cadx_tpu  # noqa: F401 — import installs the cache config

    d = jax.config.jax_compilation_cache_dir
    try:
        import os

        n = len(os.listdir(d)) if d and os.path.isdir(d) else 0
    except OSError:
        n = 0
    return {"dir": d, "entries_at_start": n}


def main():
    import os

    cache_info = _compile_cache_info()
    if not _tunnel_preflight():
        print(json.dumps({
            "metric": "images/sec/chip end-to-end (preproc+seg+classify+Grad-CAM) at 256x256",
            "value": 0.0,
            "unit": "img/s",
            "vs_baseline": 0.0,
            "error": "TPU tunnel unreachable: jax.devices() hung in every "
                     "subprocess probe over ~13.5 min (infra outage, not a "
                     "perf regression; see CLAUDE.md tunnel-outage note)",
            # context for the reader, NOT measurements from this run:
            "prior_driver_capture_img_s": 2413.4,   # BENCH_r02.json
            # last REAL-CHIP steady median (2026-08-17, commit 92544fe;
            # full JSON series with provenance in perf_history/)
            "prior_onchip_median_img_s": 4889.3,
        }))
        return

    # Retry policy (r5, after the r4 driver capture published XLA-fallback
    # numbers because ONE transient tunnel read error tripped the one-shot
    # fallback): transient transport errors get retried with backoff — the
    # persistent cache means a retry skips every already-compiled program —
    # and only a persistent/non-transient failure downgrades to the
    # bit-identical XLA fallbacks, with the error recorded in the JSON.
    transient_retries, backoff_s = 3, 60
    result = None
    last_err = None
    for attempt in range(1 + transient_retries):
        try:
            result = _measure()
            break
        except Exception as e:  # noqa: BLE001 — resilience: the driver must
            # always get a number; a logic bug would fail the XLA pass too
            # and re-raise there.
            last_err = e
            if os.environ.get("CADX_DISABLE_PALLAS") == "1":
                raise
            if _is_transient(e) and attempt < transient_retries:
                print(f"bench: transient error (attempt {attempt + 1}/"
                      f"{1 + transient_retries}): {e!r}; retrying in "
                      f"{backoff_s}s", file=sys.stderr)
                jax.clear_caches()
                time.sleep(backoff_s)
                continue
            os.environ["CADX_DISABLE_PALLAS"] = "1"
            jax.clear_caches()
            result = _measure()
            result["pallas_compile_error"] = repr(e)[:400]
            result["pallas_error_transient"] = _is_transient(e)
            result["note"] = ("Pallas kernel failed on-device compile after "
                              "retries; these are XLA-fallback numbers "
                              "(bit-identical, slower). Bisect via "
                              "ops/components._use_pallas.")
            break
    assert result is not None, last_err
    result["compile_cache"] = cache_info
    print(json.dumps(result))


def _measure() -> dict:
    import os

    from cadx_tpu.models import cnn, unet
    from cadx_tpu.ops.resize import resize_linear
    from cadx_tpu.pipeline import fused
    from cadx_tpu.preprocess import cleaner

    hw = 256
    batch = 384  # r5 re-sweep (_scratch/batch_sweep.py, on-chip): after the
    #   r3-r5 kernel work the per-pass compute dropped ~2.4x and the ~3.3ms
    #   per-dispatch tunnel floor became ~20% of a 96-batch pass, moving the
    #   optimum up: 64->5330, 96->5970, 128->5938, 192->5928, 256->6135,
    #   384->6311, 512->6303 img/s (perf_history/batch_sweep_r5.json).
    #   The old r2 note ("96 beats 128 by ~9%") measured a 40ms/96 pass.
    config = fused.PipelineConfig(
        image_hw=(hw, hw),
        feature_hw=(32, 32),
        feature_dtype="bfloat16",  # measured 1.2ms/96-batch win; opt-in
        classifier=cnn.CNNConfig(
            input_shape=(32, 32, 64),
            num_classes=2,
            conv_layers=((128, 3), (64, 3)),
            hidden_units=(256, 128),
            dropout_rate=0.3,
        ),
    )
    params = fused.init_pipeline_params(jax.random.key(0), config)
    host_batch = synthetic_mammograms(batch, hw)
    x = jax.device_put(jnp.asarray(host_batch))

    # ---- headline: full fused pipeline -------------------------------
    per_batch_ms, all_pass_ms = _median_pass_ms(
        lambda: fused.run_pipeline_checksum(params, x, config))
    imgs_per_sec = batch / (per_batch_ms / 1000)

    # optional device-level trace: CADX_BENCH_TRACE=/path captures a
    # jax.profiler trace of 3 steady-state passes (view in xprof)
    trace_dir = os.environ.get("CADX_BENCH_TRACE")
    if trace_dir:
        from cadx_tpu.utils.profiling import trace as _trace

        with _trace(trace_dir):
            for _ in range(3):
                float(fused.run_pipeline_checksum(params, x, config))

    # ---- stage split (each carries ~floor_ms of dispatch cost) -------
    @jax.jit
    def _floor(x):
        return (x.astype(jnp.float32) + 1.0).sum()

    @jax.jit
    def _clean_only(x):
        return jax.vmap(cleaner.clean_boundary_gray)(x).sum()

    @jax.jit
    def _encode_classify(x):
        clean01 = jax.vmap(cleaner.clean_boundary_gray)(x) / 255.0
        feats = unet.encoder_first_features(params.encoder, clean01[..., None])
        feats = feats.astype(jnp.dtype(config.feature_dtype))  # as production
        fs = jax.vmap(lambda f: resize_linear(
            f.astype(jnp.float32), config.feature_hw))(feats)
        probs = cnn.forward(params.classifier, fs, config.classifier)
        return probs.sum() + fs.sum() / 1e3

    floor_ms, _ = _median_pass_ms(lambda: _floor(x))
    clean_ms, _ = _median_pass_ms(lambda: _clean_only(x))
    enc_cls_ms, _ = _median_pass_ms(lambda: _encode_classify(x))
    stage = {
        "floor_ms": round(floor_ms, 2),
        "clean_ms": round(clean_ms, 2),
        "encode_classify_ms": round(enc_cls_ms, 2),  # includes clean
        "explain_residual_ms": round(per_batch_ms - enc_cls_ms, 2),
    }

    if os.environ.get("CADX_BENCH_STAGE_DETAIL"):
        # finer split INSIDE the clean chain (each program still carries
        # ~floor_ms dispatch cost; compare increments, not absolutes)
        @jax.jit
        def _suppress(x):
            def one(im):
                s, m = cleaner.suppress_artifacts(cleaner.to_uint8(im), 0.05, 15)
                return s.astype(jnp.float32).sum() + m.sum()
            return jax.vmap(one)(x).sum()

        @jax.jit
        def _suppress_segment(x):
            def one(im):
                s, m = cleaner.suppress_artifacts(cleaner.to_uint8(im), 0.05, 15)
                b, _ = cleaner.segment_breast_mask(s, 0.05)
                return b.astype(jnp.float32).sum() + m.sum()
            return jax.vmap(one)(x).sum()

        sup_ms, _ = _median_pass_ms(lambda: _suppress(x))
        supseg_ms, _ = _median_pass_ms(lambda: _suppress_segment(x))
        stage["clean_detail"] = {
            "suppress_ms": round(sup_ms, 2),
            "segment_increment_ms": round(supseg_ms - sup_ms, 2),
            "pectoral_increment_ms": round(clean_ms - supseg_ms, 2),
        }

    # ---- single-image latency (256 fused path) -----------------------
    x1 = jax.device_put(jnp.asarray(host_batch[:1]))
    p50_1, p95_1, p99_1 = _latency_ms(
        lambda: fused.run_pipeline_checksum(params, x1, config))

    # p50 full-batch latency (incl. one host round trip)
    lat = []
    float(fused.run_pipeline_checksum(params, x, config))
    for _ in range(5):
        t1 = time.perf_counter()
        float(fused.run_pipeline_checksum(params, x, config))
        lat.append(time.perf_counter() - t1)
    p50_batch = float(np.median(lat)) * 1000

    flops, bytes_ = _estimate_flops_bytes(batch, hw, config)
    secs = per_batch_ms / 1000
    est_mfu = (flops / secs) / 49e12
    est_membw = (bytes_ / secs) / 394e9

    # ---- serving-resolution block: single image at 512 ---------------
    from cadx_tpu.ops.components import _use_pallas
    from cadx_tpu.serve.engine import EngineConfig, InferenceEngine
    from cadx_tpu.xai.gradcam import gradcam_map

    eng = InferenceEngine(EngineConfig())
    img512 = jnp.asarray(synthetic_mammograms(1, 512)[0])

    # the real serving program: _segment_jit + feature resize + classify
    # + predicted-class CAM, composed exactly as /upload-single+/classify
    # drive it (serve/engine.py:120-236)
    cfg_b = eng.config.basic_classifier
    from cadx_tpu.ops.resize import resize_area

    @jax.jit
    def serve_one(img):
        gray = cleaner.clean_boundary_gray(img)
        resized = resize_area(gray, eng.config.segment_hw)
        feats = unet.encoder_first_features(
            eng.encoder_params, (resized / 255.0)[None, ..., None])[0]
        fs = resize_linear(feats, eng.config.feature_resize)
        probs = cnn.forward(eng.basic_params, fs[None], cfg_b)[0]
        cls = jnp.argmax(probs)
        # PREDICTED-class CAM (traced index), matching what /classify
        # explains; fused into the one program. The HTTP route itself
        # runs segment / predict / CAM as separate dispatches with host
        # round trips between (engine.py _classify_prepped fetches the
        # argmax before seeding the CAM), so route wall time adds 1-2
        # tunnel RTTs on top of these numbers — this block measures the
        # single-program serving path a production engine compiles.
        cam = gradcam_map(eng.basic_params, fs, cls, cfg_b)
        return probs.sum() + cam.sum() + cls

    p50_512, p95_512, p99_512 = _latency_ms(lambda: serve_one(img512), n=30)
    ms512, _ = _median_pass_ms(lambda: serve_one(img512), iters=10, passes=3)
    gates_512 = {
        "largest_obj": _use_pallas(512, 512),
        "equalize": _use_pallas(512, 512, planes=8),
        "fused_front_pectoral": _use_pallas(512, 512, planes=16),
    }
    if os.environ.get("CADX_DISABLE_PALLAS") != "1":
        assert gates_512["largest_obj"] and gates_512["equalize"], (
            "Pallas gate must engage for the standalone kernels at 512 "
            f"(got {gates_512})")

    target = 1000.0
    return {
        "metric": "images/sec/chip end-to-end (preproc+seg+classify+Grad-CAM) at 256x256",
        "value": round(imgs_per_sec, 1),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_sec / target, 3),
        "batch": batch,
        "pass_ms_median": round(per_batch_ms, 2),
        "all_pass_ms": [round(v, 2) for v in all_pass_ms],
        "stage_split": stage,
        "p50_latency_ms_batch": round(p50_batch, 2),
        "single_image_ms": {"p50": round(p50_1, 2), "p95": round(p95_1, 2),
                            "p99": round(p99_1, 2)},
        "serve_512": {
            "metric": ("single-image 512x512 serving path, fused one-program"
                       " form (clean->512->encoder->classify->predicted-class"
                       " CAM); the HTTP route's separate dispatches add 1-2"
                       " host RTTs on top"),
            "p50_ms": round(p50_512, 2),
            "p95_ms": round(p95_512, 2),
            "p99_ms": round(p99_512, 2),
            "pipelined_ms": round(ms512, 2),
            "img_per_sec_pipelined": round(1000.0 / ms512, 1),
            "pallas_gates": gates_512,
        },
        "est_mfu": round(est_mfu, 4),
        "est_membw_util": round(est_membw, 4),
    }


if __name__ == "__main__":
    main()
