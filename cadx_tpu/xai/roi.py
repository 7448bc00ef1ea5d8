"""Region-of-interest extraction from explanation heatmaps.

The reference hardcodes its ROI coordinates (app.py:563, :714:
roiCoords = {top:0.20, left:0.30, ...} for every image). Here the ROI is
computed from the Grad-CAM map: bounding box of the largest connected
region above a relative activation threshold, in normalized [0,1]
viewer coordinates (the RegionOfInterest.html contract).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cadx_tpu.ops.components import largest_component


@functools.partial(jax.jit, static_argnames=("threshold",))
def roi_from_cam(cam: jax.Array, threshold: float = 0.6):
    """cam: (h, w) in [0,1] -> (top, left, height, width) normalized
    bounding box of the largest hot region (always non-empty: the CAM
    argmax pixel is hot by construction)."""
    h, w = cam.shape
    # `hot` always contains at least the argmax pixel (>= is reflexive,
    # and an all-zero CAM satisfies 0 >= 0 everywhere), so the largest
    # component is never empty and the bounding box is always defined
    hot = cam >= threshold * cam.max()
    region = largest_component(hot, connectivity=8)
    rows = region.any(axis=1)
    cols = region.any(axis=0)
    y0 = jnp.argmax(rows)
    y1 = h - jnp.argmax(rows[::-1])
    x0 = jnp.argmax(cols)
    x1 = w - jnp.argmax(cols[::-1])
    return y0 / h, x0 / w, (y1 - y0) / h, (x1 - x0) / w


def roi_coords_dict(cam) -> dict:
    """The web app's roiCoords payload shape."""
    top, left, height, width = roi_from_cam(jnp.asarray(cam))
    return {
        "top": round(float(top), 4),
        "left": round(float(left), 4),
        "width": round(float(width), 4),
        "height": round(float(height), 4),
    }
