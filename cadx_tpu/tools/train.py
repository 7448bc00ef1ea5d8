"""End-to-end training CLI: mapping CSV -> trained model + artifacts.

Reproduces the reference's offline training workflow (the commented-out
scripts in Classes/CNNModel.py:592-620 and the artifact set under
static/trained_model/) as one command:

    python -m cadx_tpu.tools.train --csv mapping.csv --out-dir out/ \
        --pipeline basic --epochs 20 --batch-size 32

Produces, in --out-dir:
- cnn_model{_basic|_advanced}.npz      (reference npz schema, best weights)
- training_History_{name}.json         (per-epoch loss/val_acc)
- training_summary_{name}.json         (dataset/model/training/evaluation/
                                        label_encoder/Training Time blocks)
- train_state.pkl                      (full resume state)

Features modes:
- raw:     resized grayscale images as (H, W, 1) inputs
- encoder: the deployment path — on-device cleaning + U-Net encoder conv1
           features resized to the classifier input (app.py:96-150 + :466)
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp


def load_images(csv_path: str, use_native: bool = True):
    """(images list, labels int array, encoder dict) with graceful skip."""
    from cadx_tpu.data import dataset

    ds = dataset.load_mapping_csv(csv_path)
    if not ds.raw_images:
        raise SystemExit(f"no readable DICOMs in {csv_path}")
    return ds.raw_images, np.asarray(ds.raw_classes), ds.label_encoder


def build_features(images, mode: str, resize_hw, feature_hw):
    from cadx_tpu.data.dataset import normalize_images, resize_images

    if mode == "raw":
        x = resize_images(images, resize_hw)
        return normalize_images(x, "unit")[..., None].astype(np.float32)

    # encoder mode: cleaner + conv1 features per image
    from cadx_tpu.models import unet
    from cadx_tpu.ops.resize import resize_linear
    from cadx_tpu.preprocess import cleaner

    enc_params = unet.init_resnet_encoder(jax.random.key(0))

    @jax.jit
    def featurize(img):
        clean01 = cleaner.clean_for_unet(img)
        feats = unet.encoder_first_features(enc_params, clean01[None, ..., None])[0]
        return resize_linear(feats, feature_hw)

    out = []
    for im in images:
        out.append(np.asarray(featurize(jnp.asarray(
            np.asarray(im, np.float32)))))
    return np.stack(out)


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser(description="cadx_tpu trainer")
    ap.add_argument("--csv", required=True, help="mapping CSV (dicom_file_path,pathology)")
    ap.add_argument("--out-dir", default="trained_model")
    ap.add_argument("--pipeline", choices=["basic", "advanced"], default="basic")
    ap.add_argument("--features", choices=["raw", "encoder"], default="raw")
    ap.add_argument("--resize", type=int, default=64, help="raw-mode image size")
    ap.add_argument("--feature-size", type=int, default=32, help="encoder-mode feature size")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--test-size", type=float, default=0.2)
    ap.add_argument("--conv-layers", default="8x3,16x3",
                    help="e.g. 128x3,64x3 (filters x ksize per block)")
    ap.add_argument("--hidden-units", default="128,64")
    ap.add_argument("--dropout", type=float, default=0.3)
    ap.add_argument("--kfolds", type=int, default=0, help="run k-fold CV instead of a split")
    ap.add_argument("--data-parallel", action="store_true",
                    help="shard batches over all devices")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--bf16-compute", action="store_true",
                    help="bf16 conv MXU compute (params/eval stay f32; "
                         "faster, tolerance-level parity)")
    args = ap.parse_args(argv)

    from cadx_tpu.data.dataset import split_train_test
    from cadx_tpu.models import cnn
    from cadx_tpu.train import crossval, step, summary

    os.makedirs(args.out_dir, exist_ok=True)
    images, labels, encoder = load_images(args.csv)
    mode_hw = (args.resize, args.resize)
    feat_hw = (args.feature_size, args.feature_size)
    X = build_features(images, args.features, mode_hw, feat_hw)
    n_classes = int(labels.max()) + 1

    conv_layers = tuple(
        tuple(int(v) for v in part.split("x")) for part in args.conv_layers.split(","))
    hidden_units = tuple(int(v) for v in args.hidden_units.split(","))
    config = cnn.CNNConfig(
        input_shape=X.shape[1:], num_classes=n_classes,
        conv_layers=conv_layers, hidden_units=hidden_units,
        dropout_rate=args.dropout,
    )
    optimizer = "sgd" if args.pipeline == "basic" else "adam"
    lr = args.lr if args.lr is not None else (0.01 if optimizer == "sgd" else 1e-3)

    mesh = None
    update_fn = None
    if args.data_parallel:
        from cadx_tpu.parallel import data_parallel as dp
        from cadx_tpu.parallel import mesh as meshlib

        mesh = meshlib.make_mesh()
        cdt = jnp.bfloat16 if args.bf16_compute else None
        if optimizer == "sgd":
            update_fn = dp.make_dp_sgd_update(config, mesh, compute_dtype=cdt)
        else:
            update_fn, _ = dp.make_dp_adam_update(config, mesh, lr,
                                                  compute_dtype=cdt)

    if args.kfolds >= 2:
        res = crossval.cross_validate(
            config, X, labels, n_splits=args.kfolds, epochs=args.epochs,
            lr=lr, batch_size=args.batch_size, optimizer=optimizer,
            mesh=mesh, log_fn=print,
            compute_dtype=jnp.bfloat16 if args.bf16_compute else None)
        agg = res.aggregate_metrics()
        print(f"[CV] mean acc {agg['mean_accuracy']:.4f} "
              f"± {agg['std_accuracy']:.4f}")
        import json

        with open(os.path.join(args.out_dir, "crossval_summary.json"), "w") as f:
            json.dump(agg, f, indent=2)
        return agg

    Xtr, Xte, ytr, yte = split_train_test(X, labels, args.test_size,
                                          seed=args.seed)
    params = cnn.init_params(jax.random.key(args.seed), config)
    name = args.pipeline
    npz_path = os.path.join(args.out_dir, f"cnn_model_{name}.npz")
    res = step.fit(
        params, config, Xtr, np.eye(n_classes)[ytr], Xte, yte,
        epochs=args.epochs, lr=lr, batch_size=args.batch_size,
        optimizer=optimizer, seed=args.seed, log_fn=print,
        checkpoint_path=npz_path,
        state_path=os.path.join(args.out_dir, "train_state.pkl"),
        resume=args.resume, update_fn=update_fn,
        compute_dtype=jnp.bfloat16 if args.bf16_compute else None,
    )

    y_pred = step.predict_classes(res.params, Xte, config)
    s = summary.build_summary(
        config=config, num_samples=len(X), train_split=len(Xtr),
        test_split=len(Xte), epochs=args.epochs, batch_size=args.batch_size,
        learning_rate=lr, device=jax.default_backend(),
        best_val_acc=res.best_val_acc, y_true=yte, y_pred=y_pred,
        label_encoder=encoder, train_seconds=res.train_seconds,
    )
    summary.write_summary(s, os.path.join(args.out_dir, f"training_summary_{name}.json"))
    summary.write_history(res.history,
                          os.path.join(args.out_dir, f"training_History_{name}.json"))
    print(f"[DONE] best_val_acc={res.best_val_acc:.4f} "
          f"test_acc={s['evaluation']['test_accuracy']:.4f} "
          f"time={s['Training Time']}")
    return s


if __name__ == "__main__":
    main()
