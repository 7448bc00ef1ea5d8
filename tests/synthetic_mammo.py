"""Parametrized synthetic MLO-view mammogram generator.

Shared by the pectoral corpus evidence (tools/pectoral_corpus.py, round-5
verdict #6) and the cleaner parity tests. Geometry follows the fixture
in test_cleaner.py: breast half-ellipse at the RIGHT edge (chest wall
right — required for the reference oracle's flood-seed transposition to
stay benign, see test_cleaner.mammo), bright pectoral wedge top-right,
scanner artifacts on the left. Every clinically-variable element is a
parameter: wedge angle/size/intensity, breast radii, tissue texture,
speckle density, artifact count.
"""

import cv2
import numpy as np


def make_mammo(seed: int, *, h: int = 256, w: int = 256) -> np.ndarray:
    """One synthetic variant; all parameters drawn from `seed`."""
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), np.uint8)

    # breast: half-ellipse anchored at the right edge
    ry = int(rng.integers(95, 128))      # vertical radius
    rx = int(rng.integers(95, 135))      # horizontal radius
    cy = int(rng.integers(110, 150))
    breast = np.zeros((h, w), np.uint8)
    cv2.ellipse(breast, (w - 1, cy), (rx, ry), 0, 90, 270, 255, -1)

    # textured tissue (uniform tissue equalizes to all-bright and the
    # pectoral threshold swallows the breast)
    base = float(rng.uniform(95, 125))
    sigma = float(rng.uniform(18, 32))
    tissue = (base + rng.normal(0, sigma, (h, w))).clip(40, 185)
    img[breast > 0] = tissue.astype(np.uint8)[breast > 0]

    # pectoral wedge: line a*(w-1-x) + b*y < d, top-right corner
    yy, xx = np.mgrid[0:h, 0:w]
    a = float(rng.uniform(0.6, 1.7))     # wedge slope (angle)
    d = float(rng.uniform(45, 110))      # wedge size
    wedge = (a * (w - 1 - xx) + yy) < d
    pect_val = int(rng.integers(215, 246))
    img[wedge] = np.maximum(img[wedge], pect_val)

    # speckle: bright dots inside the breast (density varies)
    n_speck = int(rng.integers(0, 40))
    for _ in range(n_speck):
        sy = int(rng.integers(0, h))
        sx = int(rng.integers(0, w))
        if breast[sy, sx]:
            cv2.circle(img, (sx, sy), int(rng.integers(1, 3)),
                       int(rng.integers(200, 250)), -1)

    # scanner artifacts + tags on the left background
    for _ in range(int(rng.integers(1, 4))):
        ay = int(rng.integers(15, h - 30))
        ax = int(rng.integers(8, 55))
        if rng.random() < 0.5:
            cv2.circle(img, (ax, ay), int(rng.integers(5, 12)),
                       int(rng.integers(180, 255)), -1)
        else:
            cv2.rectangle(img, (ax, ay), (ax + int(rng.integers(15, 35)),
                                          ay + int(rng.integers(8, 18))),
                          int(rng.integers(170, 230)), -1)

    k = 2 * int(rng.integers(1, 3)) + 1
    return cv2.GaussianBlur(img, (k, k), float(rng.uniform(1.0, 2.5)))
