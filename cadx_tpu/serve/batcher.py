"""Dynamic micro-batching for the serving engine (TPU-native serving).

The reference serves one request at a time (its Flask app loads one
.npy and runs one forward, app.py:492-606). On TPU the chip is fed by
BATCHED programs — per-sample programs leave the MXU idle and pay one
dispatch per request. This module adds the standard production-serving
answer (Triton/TF-Serving-style dynamic batching): concurrent classify
requests enqueue; a worker flushes up to `max_batch` of them after at
most `max_wait_ms` into ONE padded, statically-shaped XLA program
(classifier forward + predicted-class Grad-CAM for the ROI), then
distributes per-request result dicts identical in shape to
`InferenceEngine.classify`'s.

Static shapes: the program is always invoked at exactly `max_batch`
(zero-padded), so it compiles once — no recompile storms under load.
"""

from __future__ import annotations

import functools
import queue
import threading
import time
from concurrent.futures import Future

import numpy as np

import jax
import jax.numpy as jnp

from cadx_tpu.models import cnn
from cadx_tpu.ops.resize import resize_linear
from cadx_tpu.serve.engine import classify_result_dict
from cadx_tpu.xai.gradcam import cam_from_acts_grads, conv_features, head_logits
from cadx_tpu.xai.roi import roi_coords_dict


@functools.partial(jax.jit, static_argnames=("config", "fh", "fw"))
def _batched_classify(params, feats_hwc, config: cnn.CNNConfig,
                      fh: int, fw: int):
    """(B,H,W,C) features -> (probs, predicted, cam) in one program.

    Mirrors the per-sample path exactly: bilinear feature resize
    (process_bottleneck_features, reference app.py:466-489), CNN forward,
    and the predicted class's normalized CAM (xai/gradcam.gradcam_map
    semantics, vmapped via a per-sample one-hot vjp seed)."""
    x = feats_hwc.astype(jnp.float32)
    fs = jax.vmap(lambda f: resize_linear(f, (fh, fw)))(x)
    probs = cnn.forward(params, fs, config)
    pred = jnp.argmax(probs, axis=-1)
    acts = conv_features(params, fs, config)
    _, vjp_fn = jax.vjp(lambda a: head_logits(params, a, config), acts)
    seed = jax.nn.one_hot(pred, config.num_classes, dtype=jnp.float32)
    (grads,) = vjp_fn(seed)
    cam = cam_from_acts_grads(acts, grads)                  # (B, h, w)
    return probs, pred, cam


class MicroBatcher:
    """Aggregates concurrent classify() calls into padded batches.

    classify() blocks the calling (request) thread until its sample's
    results return from the flushed program. `n_flushes`/`n_samples`
    expose batching effectiveness (a load test asserts
    n_flushes << n_samples).
    """

    def __init__(self, engine, pipeline: str = "basic", max_batch: int = 8,
                 max_wait_ms: float = 4.0):
        if pipeline == "basic":
            self._params = engine.basic_params
            self._config = engine.config.basic_classifier
            self._fh, self._fw = engine.config.feature_resize
        else:
            self._params = engine.advanced_params
            self._config = engine.config.advanced_classifier
            self._fh, self._fw = self._config.input_shape[:2]
        self._to_hwc = engine._to_hwc
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self._q: queue.Queue = queue.Queue()
        self._stop = False
        self.n_flushes = 0
        self.n_samples = 0
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------------
    def classify(self, features: np.ndarray) -> dict:
        """Blocking per-request entry; result dict matches
        InferenceEngine.classify's schema."""
        if self._stop:
            raise RuntimeError("MicroBatcher is closed")
        fut: Future = Future()
        self._q.put((np.asarray(features, np.float32), fut))
        if self._stop:
            # close() may have drained BEFORE our put landed (check-then-
            # put race); drain again so no future is ever abandoned
            self._drain_queue()
        return fut.result()

    def close(self) -> None:
        self._stop = True
        self._worker.join(timeout=2.0)
        # fail queued (and racing post-close) requests instead of leaving
        # their futures unresolved — fut.result() has no timeout, so an
        # abandoned future would block its request thread forever
        self._drain_queue()

    def _drain_queue(self) -> None:
        while True:
            try:
                _, fut = self._q.get_nowait()
            except queue.Empty:
                break
            if not fut.done():
                fut.set_exception(RuntimeError("MicroBatcher closed"))

    # ------------------------------------------------------------------
    def _run(self) -> None:
        while not self._stop:
            try:
                first = self._q.get(timeout=0.05)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.monotonic() + self.max_wait
            while len(batch) < self.max_batch:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=left))
                except queue.Empty:
                    break
            self._flush(batch)

    def _flush(self, batch) -> None:
        """Per-request isolation: a malformed request must not poison its
        co-batched neighbours. Requests are converted individually (a bad
        payload fails only its own future), grouped by feature shape
        (individually-valid requests may differ in shape — each shape
        group runs as its own padded program), and a group-program failure
        retries its members one-by-one so only the true offender errors."""
        by_shape: dict[tuple, list] = {}
        for f, fut in batch:
            try:
                hwc = self._to_hwc(f)
                if hwc.ndim != 3:
                    raise ValueError(
                        f"features must be rank-3 (HWC), got shape {f.shape}")
            except Exception as e:  # noqa: BLE001 — this request only
                if not fut.done():
                    fut.set_exception(e)
                continue
            by_shape.setdefault(hwc.shape, []).append((hwc, fut))
        for items in by_shape.values():
            self._flush_group(items)

    def _flush_group(self, items) -> None:
        try:
            b = len(items)
            x = np.zeros((self.max_batch,) + items[0][0].shape, np.float32)
            for i, (f, _) in enumerate(items):
                x[i] = f
            probs, pred, cam = _batched_classify(
                self._params, jnp.asarray(x), self._config, self._fh, self._fw)
            probs = np.asarray(probs)[:b]
            pred = np.asarray(pred)[:b]
            cam = np.asarray(cam)[:b]
            self.n_flushes += 1
            self.n_samples += b
            for i, (_, fut) in enumerate(items):
                fut.set_result(classify_result_dict(
                    probs[i], int(pred[i]), roi_coords_dict(cam[i])))
        except Exception as e:  # noqa: BLE001
            if len(items) > 1:  # isolate the offender, keep the rest
                for item in items:
                    self._flush_group([item])
            else:
                _, fut = items[0]
                if not fut.done():
                    fut.set_exception(e)
