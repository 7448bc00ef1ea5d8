"""Pallas kernel parity tests (interpret mode on CPU; compiled on TPU).

Each kernel must be bit-identical to its XLA reference implementation in
cadx_tpu.ops — the SURVEY build-plan's "Pallas kernels swapped in behind
the lax reference" gate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadx_tpu.kernels.ccl import label_components_pallas
from cadx_tpu.kernels.flood import flood_from_pallas
from cadx_tpu.kernels.watershed_kernel import marker_watershed_pallas
from cadx_tpu.ops import components as C
from cadx_tpu.ops import watershed as W

INTERPRET = jax.default_backend() != "tpu"


@pytest.fixture
def masks(rng):
    m = rng.random((2, 128, 128)) > 0.55
    m[0, :3, :] = False
    return jnp.asarray(m)


def test_ccl_kernel_matches_xla(masks):
    for conn in (8, 4):
        ref = jax.vmap(lambda x: C._label_core(x, conn, 128))(masks)
        ours = label_components_pallas(masks, conn, interpret=INTERPRET)
        m = np.asarray(masks)
        np.testing.assert_array_equal(np.asarray(ref)[m], np.asarray(ours)[m])


def test_flood_kernel_matches_xla(masks):
    h, w = 128, 128
    border = np.zeros((h, w), bool)
    border[0, :] = border[-1, :] = True
    border[:, 0] = border[:, -1] = True
    seeds = jnp.asarray(np.broadcast_to(border, (2, h, w))) & masks
    ours = flood_from_pallas(masks, seeds, interpret=INTERPRET)
    import os

    os.environ["CADX_DISABLE_PALLAS"] = "1"
    try:
        ref = jax.vmap(lambda m, s: C.flood_from(m, s))(masks, seeds)
    finally:
        del os.environ["CADX_DISABLE_PALLAS"]
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(ours))


def test_watershed_kernel_matches_xla(rng):
    h = w = 128
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.where((xx + yy) < 96, 230.0, 90.0)
    markers = np.zeros((h, w), np.int32)
    markers[(xx + yy) < 48] = 1
    markers[(xx + yy) > 160] = 2
    imgs = jnp.asarray(img)[None]
    mks = jnp.asarray(markers)[None]

    labels_p, boundary_p = marker_watershed_pallas(imgs, mks, interpret=INTERPRET)

    import os

    os.environ["CADX_DISABLE_PALLAS"] = "1"
    try:
        labels_x, boundary_x = W.marker_watershed(jnp.asarray(img), jnp.asarray(markers))
    finally:
        del os.environ["CADX_DISABLE_PALLAS"]
    np.testing.assert_array_equal(np.asarray(labels_p)[0], np.asarray(labels_x))
    np.testing.assert_array_equal(np.asarray(boundary_p)[0], np.asarray(boundary_x))


def test_dispatch_respects_backend():
    """On CPU the ops must NOT route into compiled Pallas kernels."""
    m = jnp.asarray(np.random.default_rng(0).random((128, 128)) > 0.5)
    out = C.label_components(m)  # would raise if it tried compiled pallas on cpu
    assert out.shape == (128, 128)
