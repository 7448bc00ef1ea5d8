"""Reference-compatible public API (`Classes/` module surface).

Drop-in equivalents of the reference's research-stack classes, backed by
the TPU framework: a user of the reference's `Classes/` modules finds the
same constructors, methods, and file formats here, but every compute path
is jit-compiled JAX instead of Python loops.

Covered (reference file -> here):
- Classes/Preprocessing.py  -> Preprocessing, tiny_unet (+ its stubs
  resize/normalize/augment/split implemented for real)
- Classes/ImageSegmentation.py -> ImageSegmentation
- Classes/CNNModel.py       -> CNNModel, load_weights
- Classes/CrossValidator.py -> CrossValidator (stubs implemented)
- Classes/Model.py          -> Model, ModelEvaluator, ModelPredictor,
  ModelTrainer (abstract surface implemented)
- Classes/ExplainableAI.py  -> ExplainableAI (stub implemented)

Known reference defects are intentionally fixed, not replicated
(SURVEY.md section 2.1 "known reference defects"): no import-time weight
loads or stdout hijacking, save_model has no syntax error,
get_training_metrics takes its data explicitly, ImageSegmentation's
'same' conv returns input-sized output, and postprocess_segmented_image
returns its result.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from cadx_tpu import checkpoint as _ckpt
from cadx_tpu.data import dataset as _dataset
from cadx_tpu.models import cnn as _cnn
from cadx_tpu.models import unet as _unet
from cadx_tpu.ops import pool as _pool
from cadx_tpu.ops.conv import conv2d as _conv2d
from cadx_tpu.ops.resize import resize_linear as _resize_linear
from cadx_tpu.train import crossval as _crossval
from cadx_tpu.train import metrics as _metrics
from cadx_tpu.train import step as _step


# ---------------------------------------------------------------------------
# Preprocessing (Classes/Preprocessing.py:28-170)
# ---------------------------------------------------------------------------

class Preprocessing:
    """DICOM dataset loader + label encoder (reference Preprocessing).

    Same constructor contract: loads the mapping CSV and extracts
    features immediately. The reference's unimplemented hooks
    (resize/normalize/augment/split) are implemented here.
    """

    def __init__(self, parent_dir: str, log=print):
        self._log = log
        self.data_set: list[dict] = []
        self.raw_images: list[np.ndarray] = []
        self.raw_classes_str: list[str] = []
        self.raw_classes: list[int] = []
        self.processed_images = None
        self.feature_data = None
        self.augmentation_params = None
        self.normalization_params = None
        self.resize_shape = None
        self.image_modality = None
        self.data_set_size = 0
        self.label_encoder: dict[str, int] | None = None

        self.load_data(parent_dir)
        self.extract_features()

    def load_data(self, mapping_csv_path: str) -> None:
        ds = _dataset.load_mapping_csv(mapping_csv_path, log=self._log)
        self.data_set = ds.records
        self.data_set_size = len(ds.records)
        self._loaded = ds

    def extract_features(self) -> None:
        ds = getattr(self, "_loaded", None)
        if ds is None:
            return
        self.features = list(zip(ds.raw_images, ds.raw_classes_str))
        self.raw_images = ds.raw_images
        self.raw_classes_str = ds.raw_classes_str
        self._log(f"Extracted features from {len(self.features)} DICOM files.")

    def fit_label_encoder(self) -> None:
        self.label_encoder = _dataset.fit_label_encoder(self.raw_classes_str)
        self.raw_classes = [self.label_encoder[c] for c in self.raw_classes_str]
        self._log(f"Label Encoder Mapping: {self.label_encoder}")

    # -- hooks the reference declared but left unimplemented ---------------
    def resize_images(self, images, target_shape):
        self.resize_shape = tuple(target_shape)
        return _dataset.resize_images(images, self.resize_shape)

    def normalize_images(self, images, mode: str = "unit"):
        self.normalization_params = {"mode": mode}
        return _dataset.normalize_images(np.asarray(images), mode)

    def augment_images(self, images, params=None):
        params = params or {}
        self.augmentation_params = params
        labels = np.asarray(params.get("labels", np.zeros(len(images))))
        x, y = _dataset.augment_images(np.asarray(images), labels,
                                       seed=params.get("seed", 0))
        return x, y

    def prepare_for_segmentation(self, images):
        x = np.asarray(images, dtype=np.float32)
        if x.ndim == 3:
            x = x[..., None]
        return x

    def prepare_for_classification(self, images):
        return np.asarray(images, dtype=np.float32)

    def split_train_test(self, images, labels, test_size):
        return _dataset.split_train_test(images, labels, test_size)

    def view_DICOM_image(self, instance) -> None:
        import matplotlib.pyplot as plt

        from cadx_tpu.data import dicom as _dicom

        plt.imshow(_dicom.primary_frame(instance["DICOM"]))
        plt.title(f"DICOM Image : {instance['PatientID']}")
        plt.show()


def tiny_unet(input_shape):
    """Reference tiny_unet factory (Preprocessing.py:176-204) returning a
    keras-like model object with compile/fit/predict/bottleneck access."""
    return TinyUNetModel(input_shape)


class TinyUNetModel:
    """Minimal keras-Model-like wrapper over models.unet TinyUNet."""

    def __init__(self, input_shape, seed: int = 0):
        self.input_shape = tuple(input_shape)
        self.params = _unet.init_tiny_unet(jax.random.key(seed),
                                           in_channels=self.input_shape[-1])
        self._lr = 1e-3

    def compile(self, optimizer: str = "adam", loss: str = "mse",
                learning_rate: float = 1e-3) -> None:
        if loss != "mse":
            raise ValueError("TinyUNetModel supports the reference's MSE loss")
        self._lr = learning_rate

    def fit(self, x, y=None, epochs: int = 5, batch_size: int = 8,
            verbose: bool = False):
        """Keras-style fit. y defaults to x (the reference trains the
        autoencoder against its input, Preprocessing.py:241-245) but an
        explicit target (e.g. denoising) is honored, not ignored."""
        import optax

        x = np.asarray(x, dtype=np.float32)
        y = x if y is None else np.asarray(y, dtype=np.float32)
        if y.shape != x.shape:
            raise ValueError(f"y shape {y.shape} != x shape {x.shape}")
        if len(x) == 0:
            return []
        tx = optax.adam(self._lr)
        opt_state = tx.init(self.params)

        @jax.jit
        def train_step(params, opt_state, xb, yb):
            def loss_fn(p):
                return jnp.mean((_unet.tiny_unet_apply(p, xb) - yb) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        history = []
        for epoch in range(epochs):
            losses, weights = [], []
            for i in range(0, len(x), batch_size):
                xb = jnp.asarray(x[i : i + batch_size])
                yb = jnp.asarray(y[i : i + batch_size])
                self.params, opt_state, loss = train_step(
                    self.params, opt_state, xb, yb)
                losses.append(loss)          # device scalars; fetch once/epoch
                weights.append(float(len(xb)))
            total = float(jnp.stack(losses) @ jnp.asarray(weights, jnp.float32))
            history.append(total / max(len(x), 1))
            if verbose:
                print(f"[tiny_unet] epoch {epoch+1}/{epochs} mse={history[-1]:.5f}")
        return history

    def predict(self, x, batch_size: int = 32):
        x = np.asarray(x, dtype=np.float32)
        outs = [np.asarray(_unet.tiny_unet_apply(self.params, jnp.asarray(x[i : i + batch_size])))
                for i in range(0, len(x), batch_size)]
        return (np.concatenate(outs) if outs
                else np.zeros((0,) + tuple(x.shape[1:]), np.float32))

    def bottleneck_features(self, x, batch_size: int = 32):
        """The reference's bottleneck_model.predict (Preprocessing.py:247-248)."""
        x = np.asarray(x, dtype=np.float32)
        outs = [np.asarray(_unet.tiny_unet_bottleneck(self.params, jnp.asarray(x[i : i + batch_size])))
                for i in range(0, len(x), batch_size)]
        return np.concatenate(outs) if outs else np.zeros((0,))


# ---------------------------------------------------------------------------
# ImageSegmentation (Classes/ImageSegmentation.py:33-210)
# ---------------------------------------------------------------------------

class ImageSegmentation:
    """Simulated U-Net encoder on random weights — reference contract,
    but every op is a jitted XLA program instead of Python loops."""

    def __init__(self, seed: int = 0):
        self.original_image = None
        self.preprocessed_image = None
        self.segmented_mask = None
        self._seed = seed

    def load_image(self, image_data) -> None:
        image_data = np.asarray(image_data)
        if image_data.ndim == 3:
            image_data = np.expand_dims(image_data, axis=0)
        elif image_data.ndim != 4:
            raise ValueError("Invalid image array shape.")
        self.original_image = image_data

    # -- ops (batched NHWC) -------------------------------------------------
    def conv2d(self, input, kernel, padding="same"):
        """SAME-padded conv. (The reference's 'same' returned a
        zero-ringed (H+2p, W+2p) array by bug; this returns (H, W).)"""
        pad = "SAME" if padding == "same" else "VALID"
        return np.asarray(_conv2d(jnp.asarray(input, jnp.float32),
                                  jnp.asarray(kernel, jnp.float32), padding=pad))

    def max_pool(self, input):
        return np.asarray(_pool.max_pool_ties(jnp.asarray(input, jnp.float32), 2))

    def upsample(self, input):
        return np.asarray(_pool.upsample_nearest(jnp.asarray(input), 2))

    def average_pool(self, input, pool_size: int = 5):
        return np.asarray(_pool.avg_pool(jnp.asarray(input, jnp.float32), pool_size))

    def relu(self, x):
        return np.maximum(0, x)

    def sigmoid(self, x):
        return 1.0 / (1.0 + np.exp(-x))

    def postprocess_segmented_image(self):
        """Downscale to nearest lower power-of-two dims (16..512) — and,
        unlike the reference (which dropped the result,
        ImageSegmentation.py:116-143), store + return it."""
        if self.preprocessed_image is None or np.asarray(self.preprocessed_image).ndim != 4:
            raise ValueError("Expected image with shape (batch, height, width, channels)")
        x = jnp.asarray(self.preprocessed_image, jnp.float32)
        _, h, w, _ = x.shape

        def nearest_power_of_two(v):
            powers = [2 ** i for i in range(4, 10) if 2 ** i <= v]
            return max(powers) if powers else v

        new_h, new_w = nearest_power_of_two(h), nearest_power_of_two(w)
        out = jax.vmap(lambda im: _resize_linear(im, (new_h, new_w)))(x)
        self.preprocessed_image = np.asarray(out)
        return self.preprocessed_image

    def unet(self):
        """Conv->Pool->Conv->Pool->Bottleneck->AveragePool(3), random He
        weights (ImageSegmentation.unet, :163-186)."""
        x = jnp.asarray(self.original_image, jnp.float32)
        keys = jax.random.split(jax.random.key(self._seed), 3)
        c_in = x.shape[-1]
        w1 = jax.random.normal(keys[0], (3, 3, c_in, 16))
        w2 = jax.random.normal(keys[1], (3, 3, 16, 32))
        w3 = jax.random.normal(keys[2], (3, 3, 32, 64))

        @jax.jit
        def encode(x, w1, w2, w3):
            c1 = jax.nn.relu(_conv2d(x, w1, padding="SAME"))
            p1 = _pool.max_pool_ties(c1, 2)
            c2 = jax.nn.relu(_conv2d(p1, w2, padding="SAME"))
            p2 = _pool.max_pool_ties(c2, 2)
            bn = jax.nn.relu(_conv2d(p2, w3, padding="SAME"))
            return _pool.avg_pool(bn, 3)

        self.preprocessed_image = np.asarray(encode(x, w1, w2, w3))
        return self.preprocessed_image

    def display_segmented_image(self, image_segmented) -> None:
        import matplotlib.pyplot as plt

        num_channels = image_segmented.shape[-1]
        cols = 8
        rows = num_channels // cols + (num_channels % cols > 0)
        plt.figure(figsize=(15, rows * 2))
        for i in range(num_channels):
            plt.subplot(rows, cols, i + 1)
            plt.imshow(image_segmented[:, :, i], cmap="gray")
            plt.axis("off")
            plt.title(f"Ch {i + 1}")
        plt.tight_layout()
        plt.show()


# ---------------------------------------------------------------------------
# CNNModel (Classes/CNNModel.py:67-585) + load_weights (:30-60)
# ---------------------------------------------------------------------------

class CNNModel:
    """Reference CNN classifier surface over the jitted functional model."""

    def __init__(self, input_shape, num_classes,
                 conv_layers=[(8, 3), (16, 3)], hidden_units=[128, 64],
                 dropout_rate=0.3, leaky_alpha=0.01, seed: int = 0):
        self.config = _cnn.CNNConfig(
            input_shape=tuple(input_shape),
            num_classes=int(num_classes),
            conv_layers=tuple(tuple(c) for c in conv_layers),
            hidden_units=tuple(hidden_units),
            dropout_rate=float(dropout_rate),
            leaky_alpha=float(leaky_alpha),
        )
        self.params = _cnn.init_params(jax.random.key(seed), self.config)
        self.epoch_accuracy: list[float] = []
        self.history: list[dict] = []

    # reference-style attribute accessors
    @property
    def input_shape(self):
        return self.config.input_shape

    @property
    def num_classes(self):
        return self.config.num_classes

    @property
    def conv_layers_config(self):
        return [list(c) for c in self.config.conv_layers]

    @property
    def hidden_units(self):
        return list(self.config.hidden_units)

    @property
    def dropout_rate(self):
        return self.config.dropout_rate

    @property
    def leaky_alpha(self):
        return self.config.leaky_alpha

    def forward(self, x, training: bool = True, seed: int = 0):
        """Single-sample forward -> probs (reference forward, :162-198)."""
        x = jnp.asarray(np.asarray(x, np.float32))[None]
        rng = jax.random.key(seed) if training else None
        probs = _cnn.forward(self.params, x, self.config, training=training, rng=rng)
        return np.asarray(probs[0])

    def predict(self, X):
        """Single sample -> (argmax class, probs) (reference :524-526)."""
        probs = self.forward(X, training=False)
        return int(np.argmax(probs)), probs

    def predict_batch(self, X, batch_size: int = 64):
        preds = _step.predict_classes(self.params, np.asarray(X, np.float32),
                                      self.config, batch_size)
        return preds

    def cross_entropy(self, probs, y_true):
        return float(_cnn.cross_entropy(jnp.asarray(probs), jnp.asarray(y_true)))

    def train(self, X, y_onehot, X_test, y_test, epochs=10, lr=0.01,
              batch_size=8, optimizer="sgd", log=print):
        """Reference train loop semantics (shuffle/batch/clip/decay/best-
        weights restore), executed as jitted batched XLA programs."""
        y_test = np.asarray(y_test)
        y_test_labels = y_test if y_test.ndim == 1 else np.argmax(y_test, -1)
        res = _step.fit(
            self.params, self.config,
            np.asarray(X, np.float32), np.asarray(y_onehot, np.float32),
            np.asarray(X_test, np.float32), y_test_labels,
            epochs=epochs, lr=lr, batch_size=batch_size, optimizer=optimizer,
            log_fn=log,
        )
        self.params = res.params
        self.epoch_accuracy = res.epoch_accuracy
        self.history = res.history
        log(f"[TRAIN] Best accuracy: {res.best_val_acc:.4f}")
        return res

    def get_training_metrics(self, X_test, y_test, log=print) -> float:
        """Accuracy + confusion matrix + per-class report (reference
        :560-585, with its undefined-global bugs fixed)."""
        y_test = np.asarray(y_test)
        y_labels = y_test if y_test.ndim == 1 else np.argmax(y_test, -1)
        y_pred = self.predict_batch(X_test)
        acc = float(np.mean(y_pred == y_labels))
        cm = np.asarray(_metrics.confusion_matrix(
            jnp.asarray(y_labels), jnp.asarray(y_pred), self.config.num_classes))
        log(f"[Test Accuracy] {acc:.4f}")
        log(f"Confusion Matrix:\n{cm}")
        for cls in range(self.config.num_classes):
            total = int(cm[cls].sum())
            correct = int(cm[cls, cls])
            log(f"Class {cls}: Total={total}, Correct={correct}, Wrong={total-correct}")
        return acc

    def save_model(self, path="trained_model/cnn_model.npz") -> None:
        _ckpt.save_npz(self.params, self.config, path)

    def summary(self) -> str:
        lines = [f"CNNModel(input_shape={self.config.input_shape}, "
                 f"num_classes={self.config.num_classes})"]
        for i, (f, k) in enumerate(self.config.conv_layers):
            lines.append(f"  conv{i}: {f} filters, {k}x{k} VALID + LeakyReLU + maxpool2")
        for i, u in enumerate(self.config.hidden_units):
            lines.append(f"  dense{i}: {u} units + LeakyReLU + dropout")
        lines.append(f"  output: {self.config.num_classes} classes (softmax)")
        lines.append(f"  params: {_cnn.num_params(self.params):,}")
        return "\n".join(lines)


def load_weights(cls=CNNModel, path: str = "trained_model/cnn_model.npz"):
    """Reference module-level loader (Classes/CNNModel.py:30-60): rebuild
    the model from the npz's embedded config and inject weights."""
    config, params = _ckpt.load_npz(path)
    model = cls(
        input_shape=config.input_shape,
        num_classes=config.num_classes,
        conv_layers=[list(c) for c in config.conv_layers],
        hidden_units=list(config.hidden_units),
        dropout_rate=config.dropout_rate,
        leaky_alpha=config.leaky_alpha,
    )
    model.params = params
    return model


# ---------------------------------------------------------------------------
# CrossValidator (Classes/CrossValidator.py) — stubs implemented
# ---------------------------------------------------------------------------

class CrossValidator:
    def __init__(self, n_splits: int = 5):
        self.n_splits = n_splits
        self.kfold = _crossval.KFold(n_splits=n_splits)
        self.last_result: _crossval.CrossValResult | None = None

    def split_data(self, data, labels=None):
        data = np.asarray(data)
        return [
            ((data[tr], None if labels is None else np.asarray(labels)[tr]),
             (data[te], None if labels is None else np.asarray(labels)[te]))
            for tr, te in self.kfold.split(len(data))
        ]

    def cross_validate(self, config: _cnn.CNNConfig, X, y_labels, *,
                       epochs=10, lr=0.01, batch_size=8, optimizer="sgd",
                       mesh=None, log=None):
        self.last_result = _crossval.cross_validate(
            config, X, y_labels, n_splits=self.n_splits, epochs=epochs,
            lr=lr, batch_size=batch_size, optimizer=optimizer, mesh=mesh,
            log_fn=log,
        )
        return self.last_result

    def aggregate_metrics(self, result=None):
        result = result or self.last_result
        if result is None:
            raise ValueError("run cross_validate first")
        return result.aggregate_metrics()


# ---------------------------------------------------------------------------
# Model / ModelEvaluator / ModelPredictor / ModelTrainer (Classes/Model.py)
# ---------------------------------------------------------------------------

class Model:
    """Reference abstract Model (load/summary) — implemented."""

    def __init__(self, model_path: str | None = None):
        self.model_path = model_path
        self.model: CNNModel | None = None
        if model_path:
            self.load_model(model_path)

    def load_model(self, path: str) -> CNNModel:
        self.model = load_weights(CNNModel, path)
        self.model_path = path
        return self.model

    def summary(self) -> str:
        if self.model is None:
            return "Model(unloaded)"
        return self.model.summary()


class ModelEvaluator:
    def __init__(self, model: CNNModel):
        self.model = model
        self._cache: tuple | None = None  # (X, y, result) by identity

    def evaluate(self, X_test, y_test) -> dict:
        # identity-keyed memo (strong refs keep ids valid): calling the
        # three reference-style accessors on one test set must not run
        # full inference three times (each pass costs real device time)
        if self._cache is not None and self._cache[0] is X_test                 and self._cache[1] is y_test:
            return self._cache[2]
        y_arr = np.asarray(y_test)
        y_labels = y_arr if y_arr.ndim == 1 else np.argmax(y_arr, -1)
        y_pred = self.model.predict_batch(X_test)
        result = _metrics.evaluation_block(y_labels, y_pred,
                                           self.model.config.num_classes)
        self._cache = (X_test, y_test, result)
        return result

    def accuracy(self, X_test, y_test) -> float:
        return self.evaluate(X_test, y_test)["test_accuracy"]

    def confusion_matrix(self, X_test, y_test):
        return np.asarray(self.evaluate(X_test, y_test)["confusion_matrix"])

    def classification_report(self, X_test, y_test) -> dict:
        return self.evaluate(X_test, y_test)["classification_report"]


class ModelPredictor:
    def __init__(self, model: CNNModel):
        self.model = model

    def predict(self, X):
        return self.model.predict(X)

    def predict_batch(self, X, batch_size: int = 64):
        return self.model.predict_batch(X, batch_size)


class ModelTrainer:
    def __init__(self, model: CNNModel):
        self.model = model
        self._compiled: dict[str, Any] = {"optimizer": "sgd", "lr": 0.01}

    def compile(self, optimizer: str = "sgd", learning_rate: float = 0.01):
        self._compiled = {"optimizer": optimizer, "lr": learning_rate}

    def train(self, X, y_onehot, X_test, y_test, epochs=10, batch_size=8):
        return self.model.train(X, y_onehot, X_test, y_test, epochs=epochs,
                                lr=self._compiled["lr"], batch_size=batch_size,
                                optimizer=self._compiled["optimizer"])

    def cross_validate(self, X, y_labels, n_splits: int = 5, **kw):
        cv = CrossValidator(n_splits)
        return cv.cross_validate(self.model.config, X, y_labels, **kw)

    def save(self, path: str):
        self.model.save_model(path)


# ---------------------------------------------------------------------------
# ExplainableAI (Classes/ExplainableAI.py) — stub implemented
# ---------------------------------------------------------------------------

class ExplainableAI:
    """Reference XAI surface: heatmap generation + overlay + visualize."""

    def __init__(self, model: CNNModel | None = None, colormap: str = "jet"):
        self.model = model
        self.heatmap = None
        self.last_conv_layer = None
        self.colormap = colormap

    def generate_heatmap(self, image, class_idx: int = 0, method: str = "gradcam"):
        from cadx_tpu.xai import gradcam, saliency

        if self.model is None:
            raise ValueError("attach a CNNModel first")
        x = jnp.asarray(np.asarray(image, np.float32))
        if method == "gradcam":
            cam = gradcam.gradcam_map(self.model.params, x, class_idx,
                                      self.model.config)
            self.heatmap = np.asarray(cam)
        else:
            d = saliency.input_gradient(self.model.params, x, class_idx,
                                        self.model.config)
            self.heatmap = np.asarray(saliency.saliency_map_u8(d)) / 255.0
        return self.heatmap

    def overlay_heatmap(self, image, heatmap=None, alpha: float = 0.5):
        """RGB uint8 overlay. Float images in [0,1] (the normalized model
        input this class operates on) are scaled to 0-255 first — a raw
        uint8 truncation would blank the base image entirely."""
        from cadx_tpu.ops.colormap import add_weighted, apply_jet, normalize_to_u8

        hm = jnp.asarray(heatmap if heatmap is not None else self.heatmap)
        img = np.asarray(image)
        if img.dtype != np.uint8:
            img = np.asarray(img, np.float64)
            if img.size and img.max() <= 1.0 + 1e-6:
                img = img * 255.0
            img = np.clip(img, 0, 255).astype(np.uint8)
        hm_u8 = normalize_to_u8(hm)
        heat = apply_jet(hm_u8)[..., ::-1]  # BGR LUT -> RGB for display
        heat = jnp.clip(jnp.round(_resize_linear(
            heat.astype(jnp.float32), img.shape[:2])), 0, 255).astype(jnp.uint8)
        img3 = jnp.asarray(img if img.ndim == 3 else np.stack([img] * 3, -1))
        return np.asarray(add_weighted(img3, 1 - alpha, heat, alpha))

    def visualize_prediction(self, image, class_idx: int = 0):
        self.generate_heatmap(image, class_idx)
        display = np.asarray(image)
        if display.ndim == 3:
            display = display.max(axis=-1)
        return self.overlay_heatmap(display)
