"""Data-parallel training/eval over a TPU mesh.

Batch dims are sharded over the "data" mesh axis, params replicated; XLA
inserts the psum that reduces gradients across devices (no hand-written
collectives — SURVEY.md section 2.2's TPU-native DP plan). The produced
update functions plug into ``cadx_tpu.train.step.fit(update_fn=...)`` so
the single-device epoch loop gains mesh execution without changes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from jax.sharding import Mesh

from cadx_tpu.models import cnn
from cadx_tpu.parallel.mesh import data_sharding, replicated
from cadx_tpu.train import optim
from cadx_tpu.train.step import masked_loss_fn


def make_dp_sgd_update(config: cnn.CNNConfig, mesh: Mesh, compute_dtype=None):
    """Mesh-sharded basic-pipeline update, fit(update_fn=...) compatible.
    compute_dtype: opt-in bf16 conv compute (see cnn.conv_stack)."""
    ds, repl = data_sharding(mesh), replicated(mesh)

    @functools.partial(
        jax.jit,
        in_shardings=(repl, ds, ds, ds, None, None),
        out_shardings=(repl, None),
        donate_argnums=(0,),
    )
    def _update(params, x, y, mask, lr, rng):
        loss, grads = jax.value_and_grad(masked_loss_fn)(
            params, x, y, mask, config, training=True, rng=rng,
            compute_dtype=compute_dtype,
        )
        return optim.sgd_reference_update(params, grads, lr), loss

    def update_fn(params, opt_state, x, y, mask, lr, rng):
        params, loss = _update(params, x, y, mask, lr, rng)
        return params, opt_state, loss

    return update_fn


def make_dp_adam_update(config: cnn.CNNConfig, mesh: Mesh, lr: float = 1e-3,
                        compute_dtype=None):
    """Mesh-sharded advanced-pipeline (Adam) update + its init_fn.
    compute_dtype: opt-in bf16 conv compute (see cnn.conv_stack)."""
    tx = optim.adam(lr)
    ds, repl = data_sharding(mesh), replicated(mesh)

    @functools.partial(
        jax.jit,
        in_shardings=(repl, repl, ds, ds, ds, None),
        out_shardings=(repl, repl, None),
        donate_argnums=(0, 1),
    )
    def _update(params, opt_state, x, y, mask, rng):
        loss, grads = jax.value_and_grad(masked_loss_fn)(
            params, x, y, mask, config, training=True, rng=rng,
            compute_dtype=compute_dtype,
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def update_fn(params, opt_state, x, y, mask, lr, rng):
        return _update(params, opt_state, x, y, mask, rng)

    return update_fn, tx.init


def make_dp_pipeline(pipeline_config, mesh: Mesh):
    """Mesh-sharded fused inference pipeline: batch dim split over "data",
    params replicated — the serving-scale fan-out of pipeline.fused."""
    import functools as _ft

    from cadx_tpu.pipeline import fused

    ds, repl = data_sharding(mesh), replicated(mesh)

    @_ft.partial(jax.jit, in_shardings=(repl, ds), out_shardings=ds)
    def run(params, batch_u8):
        return fused.run_pipeline(params, batch_u8, pipeline_config)

    return run


def make_dp_eval(config: cnn.CNNConfig, mesh: Mesh):
    """Mesh-sharded batched argmax prediction."""
    ds, repl = data_sharding(mesh), replicated(mesh)

    @functools.partial(jax.jit, in_shardings=(repl, ds), out_shardings=ds)
    def _predict(params, x):
        return jnp.argmax(cnn.apply(params, x, config, training=False), axis=-1)

    return _predict
