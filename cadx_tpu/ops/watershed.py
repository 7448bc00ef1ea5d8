"""Marker-driven watershed as jittable geodesic label relaxation.

cv2.watershed (used for pectoral-muscle/breast separation,
customImageCleaner.py:144) is a priority-queue flooding algorithm —
unjittable as-is. The TPU-native equivalent: each marker floods outward
along minimum-geodesic-cost paths where the edge cost is the intensity
difference (the same quantity that stalls OpenCV's flooding at ridges).

Algorithm: min-plus LINE-SCAN relaxation (Gauss-Seidel over the four
scan directions), implemented once in ops/geodesic_scan.py and shared
with the Pallas kernel. Along a row, the best cost reaching pixel i
from any pixel j<=i on that row is min_j (d[j] + s[i] - s[j]) where s
is the prefix sum of inter-pixel edge costs — a running min of (d - s)
plus s, computed with a shift-doubling cummin that carries the argmin's
label. One sweep = LR, RL, TB, BT scans, each seeing the previous
scan's updates, so an improvement crosses a max_scan-wide window in ONE
sweep instead of one pixel per iteration (Jacobi). The loop exits when
a full sweep changes nothing — an EXACT Bellman-Ford fixpoint, so no
label can flip later (the round-1 `stable_iters` label-stability
heuristic could freeze a boundary early on long low-cost corridors;
this replaces it). Convergence takes O(direction changes of optimal
paths) sweeps — 3-6 for real mammograms.

The contract is tolerance-tested (mask IoU vs cv2.watershed) rather than
bitwise: ridge ties may resolve differently, but basin assignments agree.
The Pallas kernel (kernels/watershed_kernel.py) runs the identical
shared scan arithmetic VMEM-resident and is dispatched for large TPU
images; results are bit-identical between the two paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from cadx_tpu.ops import geodesic_scan as G


def _shift(x: jax.Array, dy: int, dx: int, fill) -> jax.Array:
    """Shift a 2D array via pad+slice, filling vacated cells."""
    h, w = x.shape
    pad = ((max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0)))
    xp = jnp.pad(x, pad, constant_values=fill)
    return xp[max(-dy, 0) : max(-dy, 0) + h, max(-dx, 0) : max(-dx, 0) + w]


@functools.partial(jax.jit, static_argnames=("max_iters", "max_scan",
                                              "marker_label_values"))
def marker_watershed(image: jax.Array, markers: jax.Array,
                     max_iters: int = 256, max_scan: int = 256,
                     marker_label_values: tuple = ()):
    """Flood `markers` (>0 labels; 0 = unlabeled) over `image`.

    Returns (labels, boundary) where boundary marks pixels adjacent to a
    different label (cv2.watershed's -1 ridge pixels). Runs scan sweeps
    to the exact geodesic fixpoint (bounded by `max_iters` sweeps).

    marker_label_values: when the caller statically knows the distinct
    marker values AND the image is integer-valued (the equalize stage's
    output is), pass them (e.g. (255, 128, 64)): up to 3 labels on
    images <= 512 dispatch to the packed int32 relaxation
    (geodesic_scan.relax_to_fixpoint_packed — half the full-plane ops
    per sweep). Empty = unknown, (dist, label) pair form.
    """
    h, w = image.shape
    from cadx_tpu.ops.components import _use_pallas

    # planes=16: the scan kernel holds img/d/l/srow/scol + per-scan
    # shifted temporaries — measured ~14.3 live planes at 517x517 (19MB,
    # OOM'd the 16MB Mosaic stack under the old planes=10 budget).
    # Oversized images fall back to the HBM XLA path, which is exact.
    if _use_pallas(h, w, planes=16):
        from cadx_tpu.kernels.watershed_kernel import marker_watershed_pallas

        labels, boundary = marker_watershed_pallas(
            image[None], markers[None], max_iters, max_scan,
            marker_label_values=marker_label_values)
        return labels[0], boundary[0]

    img = image.astype(jnp.float32)
    if marker_label_values and G.use_packed((h, w),
                                            len(marker_label_values)):
        labels = G.relax_to_fixpoint_packed(
            _shift, img, markers.astype(jnp.int32), max_iters, max_scan,
            label_values=marker_label_values)
    else:
        labels = G.relax_to_fixpoint(_shift, img, markers.astype(jnp.int32),
                                     max_iters, max_scan)
    return labels, G.label_boundary(_shift, labels) == 1
