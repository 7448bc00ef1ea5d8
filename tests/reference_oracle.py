"""Vectorized NumPy oracle reproducing the reference CNN's exact math.

This is an independent, einsum/stride-trick implementation of the same
forward/backward semantics as the reference's per-pixel Python loops
(Classes/CNNModel.py): float64 accumulation, VALID conv + LeakyReLU,
2x2 max pool with tie-marking switches whose backward broadcasts the full
gradient to every tie, dense LeakyReLU chain, guarded float64 softmax,
and the seed gradient probs - onehot. Used as the golden source for
parity tests of the TPU implementation.
"""

from __future__ import annotations

import numpy as np


def sliding_patches(x: np.ndarray, k: int) -> np.ndarray:
    """(H,W,C) -> (H-k+1, W-k+1, k, k, C) view of all kxk patches."""
    H, W, C = x.shape
    s0, s1, s2 = x.strides
    return np.lib.stride_tricks.as_strided(
        x, (H - k + 1, W - k + 1, k, k, C), (s0, s1, s0, s1, s2), writeable=False
    )


def softmax64(z: np.ndarray) -> np.ndarray:
    z = np.clip(np.asarray(z, dtype=np.float64), -50.0, 50.0)
    z = z - z.max()
    e = np.exp(z)
    s = e.sum()
    if s == 0:
        return np.ones_like(z) / len(z)
    return e / (s + 1e-12)


def leaky(z, alpha):
    return np.where(z > 0, z, alpha * z)


class OracleCNN:
    """Single-sample forward/backward with reference semantics, vectorized.

    Weights are given in the reference layout: conv filters (F,k,k,C) with
    bias (F,), dense/output weights (units, prev) with bias (units,).
    """

    def __init__(self, config: dict, weights: dict):
        self.cfg = config
        self.w = weights
        self.alpha = config.get("leaky_alpha", 0.01)

    def forward(self, x: np.ndarray):
        """Returns (probs, cache) for backward. x: (H,W,C)."""
        cache = {"conv": [], "pool": [], "dense": []}
        out = np.asarray(x, dtype=np.float64)
        for filt, bias in zip(self.w["conv_filters"], self.w["conv_biases"]):
            k = filt.shape[1]
            patches = sliding_patches(out, k)  # (H',W',k,k,C)
            z = np.einsum("hwklc,fklc->hwf", patches, filt) + bias
            act = leaky(z, self.alpha)
            cache["conv"].append({"input": out, "output": act, "filt": filt})
            out = act
            # pool 2x2 stride 2 with tie switches
            H, W, C = out.shape
            oh, ow = H // 2, W // 2
            core = out[: oh * 2, : ow * 2, :].reshape(oh, 2, ow, 2, C)
            pooled = core.max(axis=(1, 3))
            up = np.repeat(np.repeat(pooled, 2, axis=0), 2, axis=1)
            switches = np.zeros(out.shape, dtype=bool)
            switches[: oh * 2, : ow * 2, :] = out[: oh * 2, : ow * 2, :] == up
            cache["pool"].append({"input_shape": out.shape, "switches": switches,
                                  "out_shape": (oh, ow, C)})
            out = pooled
        flat = out.flatten()
        for W_, b_ in zip(self.w["dense_weights"], self.w["dense_biases"]):
            z = W_ @ flat + b_
            cache["dense"].append({"input": flat.copy(), "z": z, "W": W_})
            flat = leaky(z, self.alpha)
        z_out = self.w["output_weights"] @ flat + self.w["output_biases"]
        cache["output"] = {"input": flat.copy(), "z": z_out, "W": self.w["output_weights"]}
        probs = softmax64(z_out)
        return probs, cache

    def backward(self, cache: dict, y_onehot: np.ndarray):
        """Gradients for one sample; returns dict + d_input wrt the image."""
        grads = {"conv_dF": [], "conv_db": [], "dense_dW": [], "dense_db": []}
        oc = cache["output"]
        probs = softmax64(oc["z"])
        d = probs - np.asarray(y_onehot, dtype=np.float64)
        grads["output_dW"] = np.outer(d, oc["input"])
        grads["output_db"] = d.copy()
        d = oc["W"].T @ d
        for dc in reversed(cache["dense"]):
            dz = d * np.where(dc["z"] > 0, 1.0, self.alpha)
            grads["dense_dW"].insert(0, np.outer(dz, dc["input"]))
            grads["dense_db"].insert(0, dz.copy())
            d = dc["W"].T @ dz
        for pc, cc in zip(reversed(cache["pool"]), reversed(cache["conv"])):
            oh, ow, C = pc["out_shape"]
            d = d.reshape(oh, ow, C)
            up = np.repeat(np.repeat(d, 2, axis=0), 2, axis=1)
            dX = np.zeros(pc["input_shape"])
            dX[: oh * 2, : ow * 2, :] = up * pc["switches"][: oh * 2, : ow * 2, :]
            d = dX
            # conv backward
            x_in, act, filt = cc["input"], cc["output"], cc["filt"]
            k = filt.shape[1]
            mask = np.where(act > 0, 1.0, self.alpha)
            dz = mask * d  # (H',W',F)
            patches = sliding_patches(x_in, k)
            dF = np.einsum("hwf,hwklc->fklc", dz, patches)
            db = dz.sum(axis=(0, 1))
            grads["conv_dF"].insert(0, dF)
            grads["conv_db"].insert(0, db)
            # dX via full-correlation scatter: accumulate filt * dz over windows
            dXin = np.zeros_like(x_in)
            Hp, Wp, F = dz.shape
            for di in range(k):
                for dj in range(k):
                    # dXin[i+di, j+dj, c] += sum_f filt[f,di,dj,c] * dz[i,j,f]
                    dXin[di : di + Hp, dj : dj + Wp, :] += np.einsum(
                        "hwf,fc->hwc", dz, filt[:, di, dj, :]
                    )
            d = dXin
        return grads, d


def make_oracle_weights(rng: np.random.Generator, config: dict) -> dict:
    """Random reference-layout weights (He conv / Xavier dense)."""
    h, w, c = config["input_shape"]
    conv_f, conv_b = [], []
    for f, k in config["conv_layers"]:
        conv_f.append(rng.standard_normal((f, k, k, c)) * np.sqrt(2.0 / (k * k * c)))
        conv_b.append(np.zeros(f))
        h, w, c = (h - k + 1) // 2, (w - k + 1) // 2, f
    prev = h * w * c
    dw, db = [], []
    for units in config["hidden_units"]:
        lim = np.sqrt(6.0 / (prev + units))
        dw.append(rng.uniform(-lim, lim, (units, prev)))
        db.append(np.zeros(units))
        prev = units
    nc = config["num_classes"]
    lim = np.sqrt(6.0 / (prev + nc))
    return {
        "conv_filters": conv_f,
        "conv_biases": conv_b,
        "dense_weights": dw,
        "dense_biases": db,
        "output_weights": rng.uniform(-lim, lim, (nc, prev)),
        "output_biases": np.zeros(nc),
    }
