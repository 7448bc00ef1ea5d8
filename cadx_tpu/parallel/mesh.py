"""Device-mesh construction and sharding helpers.

The reference has no distributed execution at all (SURVEY.md section 2.2:
single process, single sample at a time). Here parallelism is first-class
and TPU-native: a `jax.sharding.Mesh` over the chips, `NamedSharding`
annotations on batch axes, and XLA-inserted collectives (psum for grad
reduction) riding ICI. Axes:

- "data": batch sharding for data-parallel training/eval (the primary axis
  at this model scale).
- "model": reserved tensor-parallel axis; kept size 1 by default so the
  API is mesh-shape-stable if models ever outgrow one chip.

Multi-host: call `initialize_distributed()` (jax.distributed) before mesh
construction; `jax.devices()` then spans hosts and the same mesh code
rides ICI intra-slice / DCN across slices.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    *,
    devices=None,
) -> Mesh:
    """Build a (data, model) mesh. Default: all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {n_data*n_model} devices, "
            f"have {len(devices)}"
        )
    grid = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis sharding: dim 0 split over "data", rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_distributed(**kwargs) -> None:
    """Multi-host init (no-op if single-process)."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process


def shard_batch(mesh: Mesh, *arrays):
    """Device-put host arrays with batch-dim sharding over the mesh."""
    ds = data_sharding(mesh)
    out = tuple(jax.device_put(a, ds) for a in arrays)
    return out if len(out) > 1 else out[0]
