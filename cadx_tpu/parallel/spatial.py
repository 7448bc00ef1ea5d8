"""Spatial (height-axis) sharding — the framework's context-parallel
analogue.

The reference has no sequence dimension (SURVEY.md section 2.2): its long
-input axis is image SPACE. Full-resolution mammograms run ~4K x 3K; a
single chip holds them, but the encoder convs can also shard the height
axis across the mesh — XLA inserts the halo exchanges for the conv
windows automatically from a NamedSharding on H. This module provides
that wiring (and is exercised on the virtual 8-device mesh in tests).

Mesh axis reuse: H shards over the same "data" axis used for batch
parallelism — callers choose per-call whether a batch is data-parallel
(many images) or spatially-parallel (few huge images).
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cadx_tpu.models import unet
from cadx_tpu.parallel.mesh import DATA_AXIS


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, C) arrays sharded along H over the data axis."""
    return NamedSharding(mesh, P(None, DATA_AXIS, None, None))


def make_spatial_encoder(mesh: Mesh):
    """Encoder conv1 features with the input's H axis sharded over the
    mesh. XLA partitions the 7x7/2 conv with halo exchange over ICI; the
    output keeps the same H sharding."""
    ss = spatial_sharding(mesh)
    repl = NamedSharding(mesh, P())

    @functools.partial(jax.jit, in_shardings=(repl, ss), out_shardings=ss)
    def run(encoder_params, img):
        return unet.encoder_first_features(encoder_params, img)

    return run


def make_spatial_cleaner(mesh: Mesh):
    """Elementwise/windowed cleaning stages under H sharding (threshold,
    morphology; the global CC stages need full-image views and run
    replicated — documented limit of the spatial mode)."""
    from cadx_tpu.ops.morphology import median_blur3
    from cadx_tpu.ops.threshold import binary_threshold, relative_threshold_value, to_uint8

    ss2 = NamedSharding(mesh, P(DATA_AXIS, None))

    @functools.partial(jax.jit, in_shardings=(ss2,), out_shardings=ss2)
    def run(img):
        raw8 = to_uint8(img)
        smoothed = median_blur3(raw8)
        th = relative_threshold_value(smoothed, 0.05)
        return binary_threshold(smoothed, th, 255)

    return run
