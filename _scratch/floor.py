"""Scratch: per-program dispatch floor + jet trapezoid-fit check."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10, passes=5):
    float(fn(*args))
    ms = []
    for _ in range(passes):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        total = float(jnp.stack(outs).sum())
        assert np.isfinite(total)
        ms.append((time.perf_counter() - t0) / iters * 1000)
    ms.sort()
    return ms[len(ms) // 2]


hw, batch = 256, 96
rng = np.random.default_rng(0)
x = jax.device_put(jnp.asarray(rng.random((batch, hw, hw), np.float32)))
heat = jax.device_put(jnp.asarray(rng.integers(0, 255, (batch, hw, hw), np.uint8)))


@jax.jit
def trivial(x):
    return (x + 1.0).sum()


@jax.jit
def elementwise10(x):
    for _ in range(10):
        x = x * 1.0001 + 0.1
    return x.sum()


print(f"trivial (x+1).sum      : {timeit(trivial, x):7.2f} ms")
print(f"10 elementwise passes  : {timeit(elementwise10, x):7.2f} ms")

# ---- exact arithmetic JET fit ----
import cv2

lut = cv2.applyColorMap(np.arange(256, dtype=np.uint8).reshape(256, 1),
                        cv2.COLORMAP_JET).reshape(256, 3).astype(np.float64)

# cv2 jet = linear interpolation of the 64-anchor MATLAB jet scaled x255,
# sampled at pos = i*63/255. Reproduce in float and compare.
def jet64():
    n = 64
    out = np.zeros((n, 3))
    # MATLAB jet(64): standard construction
    u = np.concatenate([np.arange(1, 17) / 16, np.ones(15), np.arange(16, 0, -1) / 16])
    # u has 16 + 15 + 16 = 47 entries
    g_idx = np.arange(len(u)) + 8  # ceil(64/4) = 16 -> offset?
    # classic: r = g + 16, b = g - 16 region logic; easier: use formula
    x = (np.arange(n) + 0.5) / n
    return None

# Instead: directly fit piecewise-linear per channel from the LUT and
# verify trapezoid clip form: c(i) = clip(min(a1 + s*i, a2 - s*i), 0, 255)
for ch, name in [(2, "R"), (1, "G"), (0, "B")]:
    y = lut[:, ch]
    d = np.diff(y)
    slopes = sorted(set(np.round(d, 6)))
    print(name, "distinct slopes:", slopes[:10], "...", len(slopes))

# brute: find float slope s and intercepts such that
# round(clip(min(up, down), 0, 255)) == lut for all i, per channel
def try_fit(ch):
    y = lut[:, ch].astype(int)
    best = None
    # search slope around 4*255/63ish? cv2: interpolation of 64 anchors at
    # step 63/255 -> ramp slope = 255/16 per anchor * 63/255 per idx = 63/16... hmm
    # anchors ramp 16 steps 0->255 => step 255/16 /anchor; idx->anchor rate 63/255
    s = 255.0 / 16.0 * 63.0 / 255.0  # = 63/16 = 3.9375
    for up_start in range(-2000, 100):
        # up line: s*i + b; find b from first nonzero ramp point
        pass
    return s

s = 63.0 / 16.0
print("candidate slope 63/16 =", s)
# model: value(i) = round(clip(interp), 0..255) where interp = linear in i
# within segments. Derive via the actual cv2 construction:
pos = np.arange(256) * 63.0 / 255.0
k = np.floor(pos).astype(int)
frac = pos - k
anchor = np.zeros((65, 3))
# MATLAB jet 64 anchors (values in 0..1) then *255:
def matlab_jet(m=64):
    n = int(np.ceil(m / 4))
    u = np.concatenate([np.arange(1, n + 1) / n, np.ones(n - 1),
                        np.arange(n, 0, -1) / n])
    g = np.ceil(n / 2) - (1 if m % 4 == 1 else 0) + np.arange(len(u))
    J = np.zeros((m, 3))
    for i, col in enumerate(u):
        gi = int(g[i])
        if gi < m:
            J[gi, 1] = col
        ri = gi + n
        if ri < m:
            J[ri, 0] = col
        bi = gi - n
        if 0 <= bi:
            J[bi, 2] = col
    return J

J = matlab_jet(64) * 255.0
a = np.vstack([J, J[-1]])
interp = a[k] * (1 - frac[:, None]) + a[np.minimum(k + 1, 63)] * frac[:, None]
fit = np.clip(np.round(interp), 0, 255).astype(int)  # RGB order
ref = lut[:, [2, 1, 0]].astype(int)  # lut is BGR
diff = np.abs(fit - ref)
print("matlab-jet64-interp vs cv2: max diff", diff.max(),
      "mismatch rows", np.count_nonzero(diff.any(axis=1)))
if diff.max():
    bad = np.argwhere(diff.any(axis=1)).ravel()
    print(bad[:20])
    for i in bad[:10]:
        print(i, ref[i], fit[i])
