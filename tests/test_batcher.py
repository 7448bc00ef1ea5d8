"""Dynamic micro-batching (serve/batcher.py): concurrent classify
requests must aggregate into few padded programs and return per-request
results identical (to float tolerance) to the per-sample engine path.
"""

import threading

import numpy as np
import pytest

from cadx_tpu.models import cnn
from cadx_tpu.serve.engine import EngineConfig, InferenceEngine


@pytest.fixture(scope="module")
def engine():
    return InferenceEngine(EngineConfig(
        segment_hw=(64, 64),
        feature_resize=(16, 16),
        basic_classifier=cnn.CNNConfig(
            input_shape=(16, 16, 64), num_classes=2,
            conv_layers=((8, 3),), hidden_units=(32,), dropout_rate=0.0),
        advanced_classifier=cnn.CNNConfig(
            input_shape=(32, 32, 64), num_classes=2,
            conv_layers=((8, 3),), hidden_units=(32,), dropout_rate=0.0),
    ))


def _features(rng, n, hw=32):
    return rng.standard_normal((n, 64, hw, hw)).astype(np.float32)


def test_batched_matches_per_sample(engine, rng):
    """Single submit through the batcher == engine.classify."""
    batcher = engine.dynamic_batcher("basic", max_batch=4, max_wait_ms=1.0)
    for f in _features(rng, 3):
        got = batcher.classify(f)
        want = engine.classify(f, "basic")
        np.testing.assert_allclose(got["prediction_probabilities"],
                                   want["prediction_probabilities"],
                                   rtol=1e-5, atol=1e-6)
        assert got["predicted_class"] == want["predicted_class"]
        for k in ("top", "left", "width", "height"):
            assert abs(got["roiCoords"][k] - want["roiCoords"][k]) < 1e-3
        assert got["confidence"] == 76  # reference quirk preserved


def test_concurrent_requests_batch_together(engine, rng):
    """16 simultaneous requests -> far fewer program flushes than
    requests, every result correct."""
    batcher = engine.dynamic_batcher("basic", max_batch=8, max_wait_ms=25.0)
    feats = _features(rng, 16)
    # warm the compiled program so the flush window isn't eaten by compile
    batcher.classify(feats[0])
    flushes_before = batcher.n_flushes

    results = [None] * 16
    barrier = threading.Barrier(16)

    def call(i):
        barrier.wait()
        results[i] = batcher.classify(feats[i])

    threads = [threading.Thread(target=call, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    flushes = batcher.n_flushes - flushes_before
    assert flushes < 16, f"no batching happened ({flushes} flushes)"
    for i in range(16):
        want = engine.classify(feats[i], "basic")
        np.testing.assert_allclose(results[i]["prediction_probabilities"],
                                   want["prediction_probabilities"],
                                   rtol=1e-5, atol=1e-6)
        assert results[i]["predicted_class"] == want["predicted_class"]


def test_advanced_pipeline_and_padding(engine, rng):
    """The advanced (no-resize) pipeline batches too; partial batches
    (padded to max_batch) stay correct."""
    batcher = engine.dynamic_batcher("advanced", max_batch=8, max_wait_ms=1.0)
    for f in _features(rng, 2):  # 2 << max_batch: exercises zero padding
        got = batcher.classify(f)
        want = engine.classify(f, "advanced")
        np.testing.assert_allclose(got["prediction_probabilities"],
                                   want["prediction_probabilities"],
                                   rtol=1e-5, atol=1e-6)
        assert got["predicted_class"] == want["predicted_class"]


def test_worker_error_propagates(engine):
    """A bad payload rejects the waiting future instead of hanging it."""
    batcher = engine.dynamic_batcher("basic", max_batch=4, max_wait_ms=1.0)
    with pytest.raises(Exception):
        batcher.classify(np.zeros((3, 3), np.float32))  # wrong rank


def test_poisoned_request_does_not_poison_cobatched(engine, rng):
    """A malformed request failing mid-flush must fail ONLY its own
    future; co-batched valid requests still get results. Also covers
    mixed-shape batches: individually-valid requests of different
    spatial sizes run as separate shape groups in one flush."""
    batcher = engine.dynamic_batcher("basic", max_batch=8, max_wait_ms=40.0)
    good32 = _features(rng, 1)[0]
    good48 = _features(rng, 1, hw=48)[0]
    bad = np.zeros((5,), np.float32)  # rank-1: cannot be HWC features

    batcher.classify(good32)  # compile before the timed window
    results, errors = {}, {}
    barrier = threading.Barrier(3)

    def call(name, f):
        barrier.wait()
        try:
            results[name] = batcher.classify(f)
        except Exception as e:  # noqa: BLE001
            errors[name] = e

    ts = [threading.Thread(target=call, args=a) for a in
          [("good32", good32), ("good48", good48), ("bad", bad)]]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=120)
    assert set(errors) == {"bad"}
    assert set(results) == {"good32", "good48"}
    want = engine.classify(good48, "basic")
    np.testing.assert_allclose(results["good48"]["prediction_probabilities"],
                               want["prediction_probabilities"],
                               rtol=1e-5, atol=1e-6)


def test_close_drains_pending_and_rejects_new(engine, rng):
    """close() must resolve queued futures (RuntimeError), never leave a
    request thread blocked forever, and later classify() raises."""
    from cadx_tpu.serve.batcher import MicroBatcher

    b = MicroBatcher(engine, "basic", max_batch=4, max_wait_ms=1.0)
    b._stop = True            # stop the worker loop draining the queue
    b._worker.join(timeout=5)

    outcome = {}

    def call():
        try:
            outcome["r"] = b.classify(
                _features(np.random.default_rng(0), 1)[0])
        except RuntimeError as e:
            outcome["e"] = str(e)

    # enqueue directly (classify() itself now rejects post-stop)
    from concurrent.futures import Future
    fut = Future()
    b._q.put((_features(np.random.default_rng(1), 1)[0], fut))
    b.close()
    assert isinstance(fut.exception(timeout=5), RuntimeError)

    t = threading.Thread(target=call)
    t.start(); t.join(timeout=10)
    assert "e" in outcome and "closed" in outcome["e"]
