"""Training-CLI integration test: mapping CSV in, reference artifacts out."""

import csv
import json
import os

import numpy as np

from cadx_tpu.data import dicom
from cadx_tpu.tools import train as train_cli
from cadx_tpu.train import summary


def _make_dataset(tmp_path, rng, n=24):
    paths = []
    for i in range(n):
        y = i % 2
        img = rng.normal(1000, 150, (48, 48)).clip(0, 4095)
        if y:
            img[14:34, 14:34] += 1200
        p = str(tmp_path / f"c{i}.dcm")
        dicom.dcmwrite_minimal(p, img.clip(0, 4095).astype(np.uint16), f"P{i}")
        paths.append((p, "MALIGNANT" if y else "BENIGN"))
    cp = str(tmp_path / "mapping.csv")
    with open(cp, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["dicom_file_path", "pathology"])
        w.writerows(paths)
    return cp


def test_train_cli_basic(tmp_path, rng):
    cp = _make_dataset(tmp_path, rng)
    out = str(tmp_path / "out")
    s = train_cli.main([
        "--csv", cp, "--out-dir", out, "--pipeline", "basic",
        "--features", "raw", "--resize", "24", "--epochs", "4",
        "--lr", "0.05", "--batch-size", "8",
        "--conv-layers", "4x3", "--hidden-units", "16", "--dropout", "0.0",
    ])
    assert os.path.exists(os.path.join(out, "cnn_model_basic.npz"))
    assert os.path.exists(os.path.join(out, "train_state.pkl"))
    hist = summary.load_history(os.path.join(out, "training_History_basic.json"))
    assert len(hist) == 4 and set(hist[0]) == {"epoch", "loss", "val_acc"}
    loaded = summary.load_summary(os.path.join(out, "training_summary_basic.json"))
    assert loaded["label_encoder"] == {"BENIGN": 0, "MALIGNANT": 1}
    assert list(loaded) == ["dataset", "model", "training", "evaluation",
                            "label_encoder", "Training Time"]
    # bright-square task is easy: the model must actually learn
    assert loaded["evaluation"]["test_accuracy"] >= 0.8

    # npz loads back through the compat loader
    from cadx_tpu.compat import CNNModel, load_weights
    m = load_weights(CNNModel, os.path.join(out, "cnn_model_basic.npz"))
    assert m.config.conv_layers == ((4, 3),)


def test_train_cli_kfold(tmp_path, rng):
    cp = _make_dataset(tmp_path, rng, n=16)
    out = str(tmp_path / "outcv")
    agg = train_cli.main([
        "--csv", cp, "--out-dir", out, "--kfolds", "2", "--epochs", "2",
        "--features", "raw", "--resize", "24", "--lr", "0.05",
        "--batch-size", "8", "--conv-layers", "4x3", "--hidden-units", "16",
        "--dropout", "0.0",
    ])
    assert agg["n_splits"] == 2
    assert os.path.exists(os.path.join(out, "crossval_summary.json"))


def test_train_cli_bf16_compute(tmp_path, rng):
    """--bf16-compute end-to-end through the CLI (advanced/adam path):
    artifacts written, model still learns the easy bright-square task."""
    cp = _make_dataset(tmp_path, rng)
    out = str(tmp_path / "out_bf16")
    s = train_cli.main([
        "--csv", cp, "--out-dir", out, "--pipeline", "advanced",
        "--features", "raw", "--resize", "24", "--epochs", "5",
        "--batch-size", "8", "--conv-layers", "4x3",
        "--hidden-units", "16", "--dropout", "0.0", "--bf16-compute",
    ])
    assert os.path.exists(os.path.join(out, "cnn_model_advanced.npz"))
    assert s["evaluation"]["test_accuracy"] >= 0.8
