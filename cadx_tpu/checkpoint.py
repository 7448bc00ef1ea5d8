"""Checkpointing: reference-compatible ``.npz`` plus full training state.

The reference persists models as ``.npz`` holding a JSON ``config`` string
and per-layer ``W{i}/b{i}`` arrays indexed by its interleaved
[conv,pool,...,dense...,output] layer list (Classes/CNNModel.py:530-555,
load at :30-60). We read/write that exact schema so reference-trained
weights load bit-faithfully, and additionally support full training-state
checkpoints (params + optimizer state + step) the reference lacks
(SURVEY.md section 5, checkpoint/resume row).

Layout mapping (reference -> ours):
  conv  W{i}: (F, kh, kw, C)   <-> kernel (kh, kw, C, F)   [transpose 1,2,3,0]
  dense W{i}: (units, prev)    <-> kernel (prev, units)    [transpose]
  biases are shared 1-D.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from cadx_tpu.models.cnn import CNNConfig


def save_npz(params: dict, config: CNNConfig, path: str) -> None:
    """Write a reference-schema ``.npz`` (config JSON + W{i}/b{i})."""
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    idx = config.layer_indices()
    arrays: dict[str, np.ndarray] = {}
    for li, layer in zip(idx["conv"], params["conv"]):
        arrays[f"W{li}"] = np.asarray(layer["kernel"]).transpose(3, 0, 1, 2)
        arrays[f"b{li}"] = np.asarray(layer["bias"])
    for li, layer in zip(idx["dense"], params["dense"]):
        arrays[f"W{li}"] = np.asarray(layer["kernel"]).T
        arrays[f"b{li}"] = np.asarray(layer["bias"])
    arrays[f"W{idx['output']}"] = np.asarray(params["output"]["kernel"]).T
    arrays[f"b{idx['output']}"] = np.asarray(params["output"]["bias"])
    # write through a file object: np.savez(str_path) silently APPENDS
    # ".npz" when missing, landing the checkpoint at a different filename
    # than the caller asked for (a later load of the same path fails)
    with open(path, "wb") as f:
        np.savez(f, config=json.dumps(config.to_json_dict()), **arrays)


def load_npz(path: str, dtype=jnp.float32) -> tuple[CNNConfig, dict]:
    """Load a reference-schema ``.npz`` into (CNNConfig, params pytree)."""
    try:
        # allow_pickle=False: the reference schema is pickle-free (config
        # is a plain string array, weights numeric) and serve/tools pass
        # user-supplied paths here — pickle would mean arbitrary code exec.
        # `with` closes the NpzFile's zip handle (one fd leaked per load
        # otherwise)
        with np.load(path, allow_pickle=False) as data:
            config = CNNConfig.from_json_dict(json.loads(str(data["config"])))
            idx = config.layer_indices()
            params: dict[str, Any] = {"conv": [], "dense": []}
            for li in idx["conv"]:
                params["conv"].append(
                    {
                        "kernel": jnp.asarray(data[f"W{li}"], dtype).transpose(1, 2, 3, 0),
                        "bias": jnp.asarray(data[f"b{li}"], dtype),
                    }
                )
            for li in idx["dense"]:
                params["dense"].append(
                    {
                        "kernel": jnp.asarray(data[f"W{li}"], dtype).T,
                        "bias": jnp.asarray(data[f"b{li}"], dtype),
                    }
                )
            li = idx["output"]
            params["output"] = {
                "kernel": jnp.asarray(data[f"W{li}"], dtype).T,
                "bias": jnp.asarray(data[f"b{li}"], dtype),
            }
            return config, params
    except OSError:
        raise  # environment problem (missing/unreadable), not a format one
    except Exception as e:  # zip/pickle/json/KeyError internals are cryptic
        raise ValueError(
            f"{path!r} is not a readable cnn_model .npz (expected the "
            f"reference schema: a 'config' JSON entry plus W{{i}}/b{{i}} "
            f"arrays for every conv/dense/output layer): "
            f"{type(e).__name__}: {e}"
        ) from e


# ---------------------------------------------------------------------------
# Full training-state checkpoints (params + optax state + step + rng)
# ---------------------------------------------------------------------------

def save_train_state(path: str, state: Any) -> None:
    """Persist a full training state pytree (host-side, pickle of numpy)."""
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)

    def to_host(x):
        if isinstance(x, jax.Array):
            # typed PRNG keys can't cross to numpy directly
            if jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
                return {"__prng_key_data__": np.asarray(jax.random.key_data(x))}
            return np.asarray(x)
        return x

    host_state = jax.tree_util.tree_map(to_host, state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(host_state, f)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint


def restore_key(obj):
    """Rehydrate a PRNG key serialized by save_train_state."""
    if isinstance(obj, dict) and "__prng_key_data__" in obj:
        return jax.random.wrap_key_data(jnp.asarray(obj["__prng_key_data__"]))
    return jnp.asarray(obj)


class _RestrictedUnpickler(pickle.Unpickler):
    """Unpickler that only resolves the exact reconstructors a saved train
    state needs: numpy array/dtype/scalar rebuilding, optax *namedtuple*
    state classes, and plain builtin containers. save_train_state converts
    every jax.Array (incl. PRNG keys) to numpy/dict first, so nothing else
    is legitimate. Whole-module-root allowlists are NOT safe: e.g.
    numpy.testing._private.utils.runstring is a plain exec wrapper, so a
    crafted pickle rooted anywhere in numpy could still execute code
    (round-3 advisor finding). Exact names + a tuple-subclass proof for
    optax close that hole; test_checkpoint pins gadget rejection."""

    _SAFE_BUILTINS = {"dict", "list", "tuple", "set", "frozenset",
                      "complex", "bytearray", "slice"}
    # numpy's pickle reduce functions moved from numpy.core to numpy._core
    # across versions; accept both spellings of the same reconstructors.
    _SAFE_EXACT = {
        ("numpy._core.multiarray", "_reconstruct"),
        ("numpy.core.multiarray", "_reconstruct"),
        ("numpy._core.multiarray", "scalar"),
        ("numpy.core.multiarray", "scalar"),
        ("numpy._core.numeric", "_frombuffer"),
        ("numpy.core.numeric", "_frombuffer"),
        ("numpy", "ndarray"),
        ("numpy", "dtype"),
        ("numpy.dtypes", None),  # dtype classes (numpy>=1.25 pickling)
        ("collections", "OrderedDict"),
    }

    def find_class(self, module, name):
        if (module, name) in self._SAFE_EXACT or (module, None) in self._SAFE_EXACT:
            return super().find_class(module, name)
        if module == "builtins" and name in self._SAFE_BUILTINS:
            return super().find_class(module, name)
        if module.split(".")[0] == "optax":
            # optax optimizer states are namedtuples of arrays; a
            # namedtuple class is a tuple subclass whose construction
            # runs no user code. Resolve, then require that proof.
            cls = super().find_class(module, name)
            if isinstance(cls, type) and issubclass(cls, tuple):
                return cls
            raise pickle.UnpicklingError(
                f"optax reference {module}.{name} is not a namedtuple state")
        raise pickle.UnpicklingError(
            f"train-state checkpoints may not reference {module}.{name}")


def load_train_state(path: str) -> Any:
    with open(path, "rb") as f:
        return _RestrictedUnpickler(f).load()


# ---------------------------------------------------------------------------
# Orbax-backed checkpoints (multi-host-safe, async-capable)
# ---------------------------------------------------------------------------

def save_orbax(path: str, tree: Any) -> None:
    """Persist a pytree with Orbax (production checkpointing: atomic
    directory commit, multi-host coordination)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), tree, force=True)


def load_orbax(path: str, like: Any | None = None) -> Any:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            return ckptr.restore(os.path.abspath(path), like)
        return ckptr.restore(os.path.abspath(path))
