"""Compat-API tests: DICOM reader, Preprocessing, ImageSegmentation,
CNNModel class surface, CrossValidator, Model*, ExplainableAI."""

import csv
import os

import jax
import numpy as np
import pytest

from cadx_tpu.compat import (
    CNNModel, CrossValidator, ExplainableAI, ImageSegmentation, Model,
    ModelEvaluator, ModelPredictor, ModelTrainer, Preprocessing, load_weights,
    tiny_unet,
)
from cadx_tpu.data import dicom


@pytest.fixture
def dicom_dataset(tmp_path, rng):
    """Three synthetic DICOMs + a mapping CSV (one path intentionally bad)."""
    paths = []
    for i, label in enumerate(["BENIGN", "MALIGNANT", "BENIGN"]):
        img = rng.integers(0, 4096, (32, 24), dtype=np.uint16)
        p = str(tmp_path / f"case{i}.dcm")
        dicom.dcmwrite_minimal(p, img, patient_id=f"P{i:04d}.dcm")
        paths.append((p, label))
    csv_path = str(tmp_path / "mapping.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["dicom_file_path", "pathology"])
        for p, label in paths:
            w.writerow([p, label])
        w.writerow([str(tmp_path / "missing.dcm"), "BENIGN"])  # graceful skip
    return csv_path


def test_dicom_roundtrip(tmp_path, rng):
    img = rng.integers(0, 65535, (16, 20), dtype=np.uint16)
    p = str(tmp_path / "x.dcm")
    dicom.dcmwrite_minimal(p, img, patient_id="HELLO")
    ds = dicom.dcmread(p)
    np.testing.assert_array_equal(ds.pixel_array, img)
    assert ds.PatientID == "HELLO"
    # uint8 path
    img8 = rng.integers(0, 255, (8, 8), dtype=np.uint8)
    p8 = str(tmp_path / "y.dcm")
    dicom.dcmwrite_minimal(p8, img8)
    np.testing.assert_array_equal(dicom.dcmread(p8).pixel_array, img8)
    with pytest.raises(dicom.DicomError):
        dicom.dcmread(b"\x00" * 200)


def test_preprocessing_loads_and_encodes(dicom_dataset):
    logs = []
    prep = Preprocessing(dicom_dataset, log=logs.append)
    assert prep.data_set_size == 3          # bad row skipped
    assert len(prep.raw_images) == 3
    assert prep.data_set[0]["PatientID"] == "P0000"  # .dcm suffix stripped
    prep.fit_label_encoder()
    assert prep.label_encoder == {"BENIGN": 0, "MALIGNANT": 1}
    assert prep.raw_classes == [0, 1, 0]
    # implemented hooks
    resized = prep.resize_images(prep.raw_images, (16, 16))
    assert resized.shape == (3, 16, 16)
    norm = prep.normalize_images(resized)
    assert norm.max() <= 1.0
    xtr, xte, ytr, yte = prep.split_train_test(norm, np.array(prep.raw_classes), 0.34)
    assert len(xtr) + len(xte) == 3


def test_image_segmentation_contract(rng):
    seg = ImageSegmentation(seed=0)
    img = rng.random((24, 24, 1)).astype(np.float32)
    seg.load_image(img)
    assert seg.original_image.shape == (1, 24, 24, 1)
    out = seg.unet()
    # conv same keeps 24 -> pool 12 -> pool 6 -> avgpool3 -> 2
    assert out.shape == (1, 2, 2, 64)
    with pytest.raises(ValueError):
        seg.load_image(rng.random((2, 3)))
    up = seg.upsample(out)
    assert up.shape == (1, 4, 4, 64)
    post = seg.postprocess_segmented_image()  # returns result (ref dropped it)
    assert post is not None


def test_tiny_unet_wrapper(rng):
    m = tiny_unet((16, 16, 1))
    m.compile(optimizer="adam", loss="mse", learning_rate=3e-3)
    yy, xx = np.mgrid[0:16, 0:16] / 16.0
    x = np.stack([0.5 + 0.4 * np.sin(3 * xx + p) for p in np.linspace(0, 3, 8)])[..., None]
    hist = m.fit(x, epochs=6, batch_size=4)
    assert hist[-1] < hist[0]
    pred = m.predict(x)
    assert pred.shape == x.shape
    bn = m.bottleneck_features(x)
    assert bn.shape == (8, 4, 4, 64)


def test_cnn_model_class_surface(tmp_path, rng):
    model = CNNModel(input_shape=(12, 12, 2), num_classes=2,
                     conv_layers=[(4, 3)], hidden_units=[16],
                     dropout_rate=0.0)
    x = rng.standard_normal((12, 12, 2)).astype(np.float32)
    probs = model.forward(x, training=False)
    assert probs.shape == (2,) and abs(probs.sum() - 1) < 1e-5
    cls_, p = model.predict(x)
    assert cls_ in (0, 1)

    # train on separable data
    y = rng.integers(0, 2, 48)
    X = rng.standard_normal((48, 12, 12, 2)).astype(np.float32) * 0.1
    X[y == 1, 3:7, 3:7, :] += 2.0
    logs = []
    res = model.train(X, np.eye(2)[y], X[:16], y[:16], epochs=5, lr=0.05,
                      batch_size=16, log=logs.append)
    assert res.best_val_acc >= 0.9
    assert len(model.epoch_accuracy) == 5
    acc = model.get_training_metrics(X[:16], y[:16], log=logs.append)
    assert acc >= 0.9

    # save / module-level load_weights roundtrip
    path = str(tmp_path / "cnn_model.npz")
    model.save_model(path)
    m2 = load_weights(CNNModel, path)
    np.testing.assert_array_equal(m2.forward(x, training=False),
                                  model.forward(x, training=False))
    assert "params" in model.summary() or "conv0" in model.summary()


def test_cross_validator(rng):
    from cadx_tpu.models.cnn import CNNConfig

    cv = CrossValidator(n_splits=2)
    y = rng.integers(0, 2, 32)
    X = rng.standard_normal((32, 12, 12, 2)).astype(np.float32) * 0.1
    X[y == 1, 3:7, 3:7, :] += 2.0
    splits = cv.split_data(X, y)
    assert len(splits) == 2
    config = CNNConfig(input_shape=(12, 12, 2), num_classes=2,
                       conv_layers=((4, 3),), hidden_units=(16,),
                       dropout_rate=0.0)
    res = cv.cross_validate(config, X, y, epochs=2, lr=0.05, batch_size=8)
    agg = cv.aggregate_metrics()
    assert agg["n_splits"] == 2 and 0 <= agg["mean_accuracy"] <= 1


def test_model_evaluator_predictor_trainer(tmp_path, rng):
    model = CNNModel(input_shape=(12, 12, 2), num_classes=2,
                     conv_layers=[(4, 3)], hidden_units=[16], dropout_rate=0.0)
    X = rng.standard_normal((16, 12, 12, 2)).astype(np.float32)
    y = rng.integers(0, 2, 16)
    ev = ModelEvaluator(model)
    block = ev.evaluate(X, y)
    assert set(block) == {"test_accuracy", "confusion_matrix", "classification_report"}
    pr = ModelPredictor(model)
    c, p = pr.predict(X[0])
    assert pr.predict_batch(X).shape == (16,)
    tr = ModelTrainer(model)
    tr.compile(optimizer="sgd", learning_rate=0.02)
    tr.train(X, np.eye(2)[y], X, y, epochs=1, batch_size=8)
    path = str(tmp_path / "m.npz")
    tr.save(path)
    assert os.path.exists(path)
    wrapper = Model(path)
    assert "CNNModel" in wrapper.summary()


def test_explainable_ai(rng):
    model = CNNModel(input_shape=(16, 16, 3), num_classes=2,
                     conv_layers=[(4, 3)], hidden_units=[16], dropout_rate=0.0)
    xai = ExplainableAI(model)
    img = rng.standard_normal((16, 16, 3)).astype(np.float32)
    hm = xai.generate_heatmap(img, class_idx=1)
    assert hm.min() >= 0.0 and hm.max() <= 1.0
    display = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    overlay = xai.overlay_heatmap(display)
    assert overlay.shape == (32, 32, 3) and overlay.dtype == np.uint8
    sal = xai.generate_heatmap(img, class_idx=0, method="saliency")
    assert sal.shape == (16, 16)


def test_load_dicom_demo(tmp_path, rng, capsys):
    from cadx_tpu.compat.load import load_dicom

    img = rng.integers(0, 4096, (16, 16), dtype=np.uint16)
    p = str(tmp_path / "demo.dcm")
    dicom.dcmwrite_minimal(p, img, patient_id="DEMO1")
    ds = load_dicom(p, show=False)
    out = capsys.readouterr().out
    assert "DEMO1" in out and "Pixel array" in out
    np.testing.assert_array_equal(ds.pixel_array, img)
