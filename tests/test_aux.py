"""Aux subsystems: torch .pth import, stdout tee, profiling, train-state
resume, mesh-sharded pipeline."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadx_tpu.models import cnn
from cadx_tpu.train import step
from cadx_tpu.utils.logging import tee_stdout
from cadx_tpu.utils.profiling import StageTimer, throughput


def test_torch_state_dict_import(tmp_path, rng):
    torch = pytest.importorskip("torch")
    nn = torch.nn

    # ADCNNM-layout torch model (ADCNNM.py:34-78)
    class TorchCNN(nn.Module):
        def __init__(self, input_shape=(16, 16, 2), num_classes=2,
                     conv_layers=((4, 3), (8, 3)), hidden_units=(32, 16),
                     leaky_alpha=0.01):
            super().__init__()
            H, W, C = input_shape
            self.convs = nn.ModuleList()
            self.pools = nn.ModuleList()
            cin = C
            for cout, k in conv_layers:
                self.convs.append(nn.Conv2d(cin, cout, k, padding=1))
                self.pools.append(nn.MaxPool2d(2))
                cin = cout
            dummy = torch.zeros(1, C, H, W)
            for conv, pool in zip(self.convs, self.pools):
                dummy = pool(torch.nn.functional.leaky_relu(conv(dummy)))
            flat = dummy.view(1, -1).size(1)
            layers, in_units = [], flat
            for units in hidden_units:
                layers += [nn.Linear(in_units, units), nn.LeakyReLU(leaky_alpha),
                           nn.Dropout(0.1)]
                in_units = units
            layers.append(nn.Linear(in_units, num_classes))
            self.fc = nn.Sequential(*layers)

        def forward(self, x):
            x = x.permute(0, 3, 1, 2)
            for conv, pool in zip(self.convs, self.pools):
                x = pool(torch.nn.functional.leaky_relu(conv(x)))
            return self.fc(x.reshape(x.size(0), -1))

    tm = TorchCNN()
    tm.eval()
    pth = str(tmp_path / "best_model.pth")
    torch.save(tm.state_dict(), pth)

    import json

    summary = {
        "dataset": {"input_shape": [16, 16, 2], "num_classes": 2},
        "model": {"conv_layers": [[4, 3], [8, 3]], "hidden_units": [32, 16],
                  "dropout_rate": 0.1},
    }
    jp = str(tmp_path / "training_summary_advanced.json")
    with open(jp, "w") as f:
        json.dump(summary, f)

    from cadx_tpu.compat.adcnnm import load_trained_model

    config, params = load_trained_model(jp, pth)
    assert config.conv_padding == "SAME"

    x = rng.standard_normal((3, 16, 16, 2)).astype(np.float32)
    with torch.no_grad():
        ref = torch.softmax(tm(torch.tensor(x)), dim=1).numpy()
    ours = np.asarray(cnn.forward(params, jnp.asarray(x), config))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_tee_stdout(tmp_path):
    p = str(tmp_path / "log.txt")
    with tee_stdout(p):
        print("hello tee")
    assert "hello tee" in open(p).read()
    # stdout restored
    assert not isinstance(sys.stdout, type(None))
    print("after")  # must not raise / not write to file
    assert "after" not in open(p).read()


def test_stage_timer():
    t = StageTimer()
    x = jnp.ones((8, 8))
    with t.stage("mul", sync_value=None):
        y = x * 2
    with t.stage("sum", sync_value=y):
        z = y.sum()
    rep = t.report()
    assert "mul" in rep and "total" in rep


def test_throughput_helper():
    f = jax.jit(lambda v: v.sum())
    x = jnp.ones((128, 128))
    ips, per_call = throughput(f, x, iters=3, items_per_call=4)
    assert ips > 0 and per_call > 0


def _data(rng, n=32):
    y = rng.integers(0, 2, n)
    X = rng.standard_normal((n, 12, 12, 2)).astype(np.float32) * 0.1
    X[y == 1, 3:7, 3:7, :] += 2.0
    return X, y


def test_fit_resume(tmp_path, rng):
    config = cnn.CNNConfig(input_shape=(12, 12, 2), num_classes=2,
                           conv_layers=((4, 3),), hidden_units=(16,),
                           dropout_rate=0.0)
    X, y = _data(rng)
    sp = str(tmp_path / "state.pkl")

    # full run in one go
    p0 = cnn.init_params(jax.random.key(0), config)
    full = step.fit(p0, config, X, np.eye(2)[y], X, y, epochs=6, lr=0.05,
                    batch_size=8, seed=3, restore_best=False)

    # same run split 3 + resume 3 — must produce identical history tail
    p0 = cnn.init_params(jax.random.key(0), config)
    part1 = step.fit(p0, config, X, np.eye(2)[y], X, y, epochs=3, lr=0.05,
                     batch_size=8, seed=3, restore_best=False, state_path=sp)
    resumed = step.fit(p0, config, X, np.eye(2)[y], X, y, epochs=6, lr=0.05,
                       batch_size=8, seed=3, restore_best=False,
                       state_path=sp, resume=True)
    assert len(resumed.history) == 6
    assert resumed.history[:3] == part1.history
    for a, b in zip(full.history, resumed.history):
        assert a["loss"] == pytest.approx(b["loss"], rel=1e-5)
        assert a["val_acc"] == pytest.approx(b["val_acc"])


def test_train_state_unpickler_rejects_gadgets(tmp_path):
    """The restricted unpickler must reject code-execution gadgets even
    when they are rooted inside allowlisted-looking packages (numpy's
    runstring is a plain exec wrapper), while still round-tripping real
    optimizer states (round-3 advisor finding, checkpoint.py)."""
    import io
    import pickle

    import optax

    from cadx_tpu import checkpoint as ck

    params = {"W0": jnp.ones((3, 3)), "b0": jnp.zeros(3)}
    state = {
        "params": params,
        "opt_state": optax.adam(1e-3).init(params),
        "best_acc": np.float32(0.5),
        "dropout_key": jax.random.key(0),
        "host_rng_state": np.random.default_rng(0).bit_generator.state,
    }
    sp = str(tmp_path / "state.pkl")
    ck.save_train_state(sp, state)
    st = ck.load_train_state(sp)
    assert st["best_acc"] == np.float32(0.5)
    assert np.allclose(st["params"]["W0"], 1.0)
    ck.restore_key(st["dropout_key"])  # PRNG key rehydrates

    class _NumpyGadget:
        def __reduce__(self):
            import numpy.testing._private.utils as u

            return (u.runstring, ("raise SystemExit", {}))

    class _OsGadget:
        def __reduce__(self):
            import os as _os

            return (_os.system, ("true",))

    for gadget in (_NumpyGadget(), _OsGadget()):
        buf = pickle.dumps(gadget)
        with pytest.raises(pickle.UnpicklingError):
            ck._RestrictedUnpickler(io.BytesIO(buf)).load()

    # an optax-module reference that is NOT a namedtuple state must fail
    # (functions like optax.scale would otherwise be callable via REDUCE)
    up = ck._RestrictedUnpickler(io.BytesIO(b""))
    with pytest.raises(pickle.UnpicklingError):
        up.find_class("optax._src.transform", "scale")
    assert up.find_class("optax", "EmptyState") is optax.EmptyState


def test_dp_pipeline_on_mesh(rng):
    if jax.device_count() < 8:
        pytest.skip("needs an 8-device mesh")
    import cv2

    from cadx_tpu.parallel import data_parallel as dp
    from cadx_tpu.parallel import mesh as meshlib
    from cadx_tpu.pipeline import fused

    mesh = meshlib.make_mesh()
    config = fused.PipelineConfig(
        image_hw=(64, 64), feature_hw=(16, 16),
        classifier=cnn.CNNConfig(input_shape=(16, 16, 64), num_classes=2,
                                 conv_layers=((8, 3),), hidden_units=(32,),
                                 dropout_rate=0.0))
    params = fused.init_pipeline_params(jax.random.key(0), config)
    batch = np.zeros((8, 64, 64), np.uint8)
    for i in range(8):
        cv2.ellipse(batch[i], (63, 32), (30, 30), 0, 90, 270, 150, -1)
    run = dp.make_dp_pipeline(config, mesh)
    out = run(params, jnp.asarray(batch))
    assert out.probs.shape == (8, 2)
    np.testing.assert_allclose(np.asarray(out.probs).sum(-1), 1.0, atol=1e-5)
    # all 8 mesh devices hold a shard of the output
    assert len(out.probs.sharding.device_set) == 8


def test_torch_state_dict_export_roundtrip(tmp_path, rng):
    """Our params -> torch .pth -> back through load path == identity;
    TPU-trained weights become consumable by reference-side torch code."""
    pytest.importorskip("torch")
    import dataclasses

    from cadx_tpu.compat import adcnnm

    config = dataclasses.replace(
        cnn.CNNConfig(input_shape=(16, 16, 2), num_classes=2,
                      conv_layers=((4, 3), (8, 3)), hidden_units=(32, 16),
                      dropout_rate=0.1),
        conv_padding="SAME")
    params = cnn.init_params(jax.random.key(3), config)

    pth = str(tmp_path / "exported.pth")
    adcnnm.save_trained_model(params, config, pth)

    import torch

    sd = torch.load(pth, weights_only=True)
    params2 = adcnnm.params_from_torch_state_dict(sd, config)
    x = jnp.asarray(rng.standard_normal((3, 16, 16, 2)), jnp.float32)
    p1 = cnn.forward(params, x, config)
    p2 = cnn.forward(params2, x, config)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)


def test_trace_summary_tool(tmp_path):
    """tools/trace_summary parses a Chrome trace into a device-time
    table (device events only, summed per program, sorted)."""
    import gzip
    import json

    from cadx_tpu.tools import trace_summary

    d = {"traceEvents": [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 7, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "X", "pid": 3, "name": "progA", "dur": 1000},
        {"ph": "X", "pid": 3, "name": "progA", "dur": 500},
        {"ph": "X", "pid": 3, "name": "progB", "dur": 700},
        {"ph": "X", "pid": 7, "name": "host_only", "dur": 99999},
    ]}
    p = tmp_path / "plugins" / "profile" / "run1"
    p.mkdir(parents=True)
    with gzip.open(p / "vm.trace.json.gz", "wt") as f:
        json.dump(d, f)
    rows, total = trace_summary.summarize(str(tmp_path))
    assert rows == [("progA", 1.5, 2), ("progB", 0.7, 1)]
    assert total == 2.2  # ALL device time, the top-N percent denominator

    rows_top1, total_top1 = trace_summary.summarize(str(tmp_path), top=1)
    assert rows_top1 == [("progA", 1.5, 2)]
    assert total_top1 == 2.2  # total unchanged by truncation


def test_bench_pallas_fallback_retry(monkeypatch, capsys):
    """bench.py's driver contract: a Pallas remote-compile failure in the
    first measurement pass must yield XLA-fallback numbers with the
    error recorded, not crash; and the fallback env must be visible to
    the retried measurement."""
    import importlib.util
    import json as _json

    spec = importlib.util.spec_from_file_location(
        "bench_under_test",
        os.path.join(os.path.dirname(__file__), os.pardir, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    monkeypatch.delenv("CADX_DISABLE_PALLAS", raising=False)
    monkeypatch.setattr(bench, "_tunnel_preflight", lambda *a, **k: True)
    calls = {"n": 0}

    def fake_measure():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("Mosaic lowering failed: simulated")
        assert os.environ.get("CADX_DISABLE_PALLAS") == "1"
        return {"value": 42.0}

    monkeypatch.setattr(bench, "_measure", fake_measure)
    bench.main()
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["value"] == 42.0
    assert "Mosaic" in out["pallas_compile_error"]
    assert calls["n"] == 2
    # main() set the var directly (monkeypatch recorded nothing for an
    # absent var): drop it so later tests don't run Pallas-disabled
    os.environ.pop("CADX_DISABLE_PALLAS", None)

    # a second failure WITH the fallback already active must re-raise
    # (a logic bug, not a compile problem)
    monkeypatch.setenv("CADX_DISABLE_PALLAS", "1")
    calls["n"] = 0

    def always_fail():
        calls["n"] += 1
        raise RuntimeError("real bug")

    monkeypatch.setattr(bench, "_measure", always_fail)
    with pytest.raises(RuntimeError, match="real bug"):
        bench.main()
    assert calls["n"] == 1
