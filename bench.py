"""Headline benchmark: fused preproc+segment+classify+Grad-CAM pipeline.

Measures end-to-end images/sec/chip at 256x256 on the real TPU (the
BASELINE.json metric; reference publishes no throughput, so vs_baseline
is against the 1000 img/s/chip target). Prints ONE JSON line.

Timing methodology (variance-aware since round 2): the tunneled runtime
shows rare 30-60ms dispatch stalls that polluted single-run averages
(round-1 driver captured 1253 img/s vs 1600 steady-state). The
throughput measurement therefore runs R independent passes of N
enqueued iterations each and reports the MEDIAN pass (spread included
in the JSON); each pass fetches one scalar checksum at the end, forcing
full execution (plain block_until_ready under-reports on this runtime).

Utilization: the JSON also carries est_mfu / est_membw_util — analytic
FLOP and HBM-byte counts for the pipeline's dominant ops divided by the
measured time against v5e peak (197 TFLOP/s bf16 / 394 GB/s HBM BW;
f32 MXU peak ~49 TFLOP/s) — so perf work has a ceiling to aim at.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


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
    # encoder conv1: out (h/2, w/2, 64), kernel 7x7x1
    conv1_flops = b * (h // 2) * (w // 2) * 64 * 7 * 7 * 2
    # classifier convs at feature_hw
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
    # grad-cam vjp ~= forward conv cost again, per explained class
    xai_flops = 2 * conv_flops * len(config.classes_to_explain)
    flops = conv1_flops + conv_flops + dense_flops + xai_flops

    plane = b * h * w * 4  # one f32 full-image plane
    # cleaner loop state (labels+dist+scans ~6 planes traffic per sweep,
    # ~5 sweeps for CCL/flood/watershed combined stages), display image,
    # features, overlays (2 classes RGB u8) + heatmaps
    bytes_ = (
        6 * 5 * plane                 # iterative relaxation traffic
        + 2 * plane                   # clean display in/out
        + b * (h // 2) * (w // 2) * 64 * 4  # encoder features
        + len(config.classes_to_explain) * b * h * w * (3 + 1)  # u8 outputs
    )
    return float(flops), float(bytes_)


def main():
    from cadx_tpu.models import cnn
    from cadx_tpu.pipeline import fused

    hw = 256
    batch = 96  # sweet spot: 2098 img/s vs 1929 at 128 / 1992 at 32
              # (HBM working set of the u8 overlay outputs grows with batch)
    config = fused.PipelineConfig(
        image_hw=(hw, hw),
        feature_hw=(32, 32),
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

    # compile + warmup
    float(fused.run_pipeline_checksum(params, x, config))

    # Throughput: R independent passes; each enqueues `iters` iterations
    # async (device executes back-to-back) and syncs ONCE at the end —
    # per-iteration host syncs would add the tunnel's ~25ms round-trip
    # to every batch. Median pass defends against rare dispatch stalls.
    iters, passes = 10, 5
    pass_ms = []
    for _ in range(passes):
        t0 = time.perf_counter()
        outs = [fused.run_pipeline_checksum(params, x, config) for _ in range(iters)]
        total = float(jnp.stack(outs).sum())
        assert np.isfinite(total)
        pass_ms.append((time.perf_counter() - t0) / iters * 1000)
    pass_ms.sort()
    per_batch_ms = pass_ms[len(pass_ms) // 2]
    imgs_per_sec = batch / (per_batch_ms / 1000)

    # p50 single-batch latency (incl. one host round-trip)
    lat = []
    for _ in range(5):
        t1 = time.perf_counter()
        float(fused.run_pipeline_checksum(params, x, config))
        lat.append(time.perf_counter() - t1)
    p50 = float(np.median(lat))

    # p50 single-IMAGE serving latency
    x1 = jax.device_put(jnp.asarray(host_batch[:1]))
    float(fused.run_pipeline_checksum(params, x1, config))  # compile
    lat1 = []
    for _ in range(5):
        t1 = time.perf_counter()
        float(fused.run_pipeline_checksum(params, x1, config))
        lat1.append(time.perf_counter() - t1)
    p50_single = float(np.median(lat1))

    flops, bytes_ = _estimate_flops_bytes(batch, hw, config)
    secs = per_batch_ms / 1000
    # v5e: ~197 TFLOP/s bf16; classifier matmuls run HIGHEST precision
    # (f32 accumulate) => ~49 TFLOP/s effective MXU peak; HBM ~394 GB/s
    est_mfu = (flops / secs) / 49e12
    est_membw = (bytes_ / secs) / 394e9

    target = 1000.0
    print(json.dumps({
        "metric": "images/sec/chip end-to-end (preproc+seg+classify+Grad-CAM) at 256x256",
        "value": round(imgs_per_sec, 1),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_sec / target, 3),
        "p50_latency_ms_batch": round(p50 * 1000, 2),
        "p50_latency_ms_single_image": round(p50_single * 1000, 2),
        "batch": batch,
        "pass_ms_min": round(pass_ms[0], 2),
        "pass_ms_median": round(per_batch_ms, 2),
        "pass_ms_max": round(pass_ms[-1], 2),
        "est_mfu": round(est_mfu, 4),
        "est_membw_util": round(est_membw, 4),
    }))


if __name__ == "__main__":
    main()
