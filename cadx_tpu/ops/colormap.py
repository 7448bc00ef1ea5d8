"""JET colormap + overlay blending on device.

The explainability paths colormap a normalized saliency/CAM to JET and
alpha-blend it onto the input (reference explainability.py:75-77 uses
cv2.applyColorMap(COLORMAP_JET) + cv2.addWeighted(0.5, 0.5)). Here the
256x3 LUT is a host constant; application is a gather and the blend a
fused elementwise op, so the whole overlay stays in one XLA program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.cache
def jet_lut_bgr() -> np.ndarray:
    """OpenCV COLORMAP_JET as a (256, 3) uint8 BGR table.

    Computed via cv2 when available (bit-exact); otherwise the analytic
    MATLAB-style jet OpenCV derives its table from.
    """
    try:
        import cv2

        lut = cv2.applyColorMap(np.arange(256, dtype=np.uint8).reshape(256, 1),
                                cv2.COLORMAP_JET)
        return lut.reshape(256, 3)
    except ImportError:
        x = np.linspace(0.0, 1.0, 256)

        def interp(v):
            return np.clip(1.5 - np.abs(4.0 * v), 0.0, 1.0)

        r = interp(x - 0.75)
        g = interp(x - 0.5)
        b = interp(x - 0.25)
        return (np.stack([b, g, r], axis=-1) * 255.0 + 0.5).astype(np.uint8)


@functools.cache
def _jet_ramps() -> tuple | None:
    """Exact piecewise-ramp decomposition of the JET LUT, or None.

    Each channel of cv2's COLORMAP_JET is piecewise linear in the index
    with INTEGER slopes and breakpoints, so lut[i] = y0 + sum_j ds_j *
    max(i - b_j, 0) holds exactly in int32 — ~6 ramp terms per channel
    of pure elementwise arithmetic instead of a (N, 256) one-hot matmul
    (the matmul form measured ~2-3 ms/96-batch at 256x256 inside the
    fused pipeline; the ramps fuse into neighbouring elementwise ops).
    Returns (y0[3], [(b, ds) per channel]) after verifying the
    reconstruction reproduces every LUT entry; None if the table (e.g. a
    future cv2 change) stops being integer-piecewise-linear.
    """
    lut = jet_lut_bgr().astype(np.int64)  # (256, 3)
    terms = []
    for ch in range(3):
        y = lut[:, ch]
        d = np.diff(y)
        kinks = [(0, int(d[0]))] if d[0] else []
        for i in range(1, 255):
            if d[i] != d[i - 1]:
                kinks.append((i, int(d[i] - d[i - 1])))
        idx = np.arange(256)
        recon = y[0] + sum(ds * np.maximum(idx - b, 0) for b, ds in kinks)
        if not np.array_equal(recon, y):
            return None
        terms.append(kinks)
    return tuple(int(v) for v in lut[0]), tuple(tuple(t) for t in terms)


def apply_jet(gray_u8: jax.Array) -> jax.Array:
    """(H, W) uint8 -> (H, W, 3) uint8 BGR, cv2.applyColorMap(JET).

    Exact integer piecewise-ramp arithmetic (see _jet_ramps) — bit-equal
    to the LUT; falls back to a one-hot MXU matmul if the table is not
    piecewise-linear (TPU gathers from small tables are ~10x slower than
    either form)."""
    ramps = _jet_ramps()
    if ramps is not None:
        y0, terms = ramps
        i = gray_u8.astype(jnp.int32)
        chans = []
        for ch in range(3):
            acc = jnp.full_like(i, y0[ch])
            for b, ds in terms[ch]:
                acc = acc + ds * jnp.maximum(i - b, 0)
            chans.append(acc)
        return jnp.stack(chans, axis=-1).astype(jnp.uint8)
    lut = jnp.asarray(jet_lut_bgr(), jnp.float32)  # (256, 3)
    oh = jax.nn.one_hot(gray_u8.astype(jnp.int32), 256, dtype=jnp.float32)
    return jnp.round(oh @ lut).astype(jnp.uint8)


def add_weighted(a: jax.Array, alpha: float, b: jax.Array, beta: float,
                 gamma: float = 0.0) -> jax.Array:
    """cv2.addWeighted: saturate(round(a*alpha + b*beta + gamma)) as uint8."""
    out = a.astype(jnp.float32) * alpha + b.astype(jnp.float32) * beta + gamma
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def normalize_to_u8(x: jax.Array) -> jax.Array:
    """Min-max normalize to [0,255] uint8 (reference saliency scaling,
    explainability.py:73-74: (s-min)/(max-min+1e-8) then *255 truncated)."""
    x = x.astype(jnp.float32)
    lo, hi = x.min(), x.max()
    s = (x - lo) / (hi - lo + 1e-8)
    return (s * 255.0).astype(jnp.uint8)
