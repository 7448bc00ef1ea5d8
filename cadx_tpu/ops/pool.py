"""Pooling ops with the reference's exact gradient semantics.

The reference max-pool (Classes/CNNModel.py:245-277) records boolean
"switches" marking every position in each 2x2 window equal to the window
max — *ties are all marked* — and its backward scatters the full upstream
gradient to every tied position (no 1/n split). Standard XLA
select-and-scatter routes the gradient to a single argmax, so we define a
custom VJP that reproduces the tie-broadcast behaviour bit-for-bit.

All ops are batched NHWC and jit/vmap/shard_map friendly (static shapes,
no data-dependent control flow).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pool_reshape(x: jax.Array, size: int):
    """Crop trailing odd rows/cols (reference uses // so remainders drop)."""
    b, h, w, c = x.shape
    oh, ow = h // size, w // size
    x = x[:, : oh * size, : ow * size, :]
    return x.reshape(b, oh, size, ow, size, c), oh, ow


def _max_pool_fwd_impl(x: jax.Array, size: int) -> jax.Array:
    xr, _, _ = _pool_reshape(x, size)
    return xr.max(axis=(2, 4))


def _upsample_nearest(y: jax.Array, size: int) -> jax.Array:
    """Repeat each pooled cell back over its window (B,oh,ow,C)->(B,oh*s,ow*s,C)."""
    b, oh, ow, c = y.shape
    y = jnp.broadcast_to(y[:, :, None, :, None, :], (b, oh, size, ow, size, c))
    return y.reshape(b, oh * size, ow * size, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_pool_ties(x: jax.Array, size: int = 2) -> jax.Array:
    """2D max pool (window=stride=size) with tie-broadcast gradients.

    Forward matches any standard max pool; backward gives the *full*
    upstream gradient to every element equal to the window max
    (reference `_max_pool_backward`, Classes/CNNModel.py:263-277).
    """
    return _max_pool_fwd_impl(x, size)


def _max_pool_ties_fwd(x, size):
    out = _max_pool_fwd_impl(x, size)
    return out, (x, out)


def _max_pool_ties_bwd(size, res, g):
    x, out = res
    b, h, w, c = x.shape
    oh, ow = h // size, w // size
    up_out = _upsample_nearest(out, size)
    up_g = _upsample_nearest(g, size)
    cropped = x[:, : oh * size, : ow * size, :]
    dx_core = jnp.where(cropped == up_out, up_g, 0.0).astype(x.dtype)
    # Pad dropped remainder rows/cols with zero gradient.
    dx = jnp.zeros_like(x).at[:, : oh * size, : ow * size, :].set(dx_core)
    return (dx,)


max_pool_ties.defvjp(_max_pool_ties_fwd, _max_pool_ties_bwd)


def max_pool_with_switches(x: jax.Array, size: int = 2):
    """Return (pooled, switches) where switches marks window-max ties.

    Mirrors the reference forward contract (Classes/CNNModel.py:245-261):
    ``switches`` has the (cropped-padded) input shape, True at every
    position equal to its window max.
    """
    out = _max_pool_fwd_impl(x, size)
    b, h, w, c = x.shape
    oh, ow = h // size, w // size
    up_out = _upsample_nearest(out, size)
    switches = jnp.zeros(x.shape, dtype=bool)
    switches = switches.at[:, : oh * size, : ow * size, :].set(
        x[:, : oh * size, : ow * size, :] == up_out
    )
    return out, switches


def avg_pool(x: jax.Array, size: int = 3) -> jax.Array:
    """Non-overlapping average pool (reference ImageSegmentation.average_pool)."""
    xr, _, _ = _pool_reshape(x, size)
    return xr.mean(axis=(2, 4))


def upsample_nearest(x: jax.Array, factor: int = 2) -> jax.Array:
    """Nearest-neighbour upsample by an integer factor (NHWC)."""
    return _upsample_nearest(x, factor)
