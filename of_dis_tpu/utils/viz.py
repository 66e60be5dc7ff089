"""Flow visualization: the standard Middlebury color wheel.

Usage:
  python -m of_dis_tpu.utils.viz flow.flo out.png [max_flow]

Not part of the reference's surface (its verbosity-3/4 OpenCV
visualizations are commented out, oflow.cpp:301-329); provided as the
equivalent inspection tool.
"""

from __future__ import annotations

import sys

import numpy as np


def _color_wheel() -> np.ndarray:
    """The 55-entry Middlebury color wheel (RY/YG/GC/CB/BM/MR ramps)."""
    ry, yg, gc, cb, bm, mr = 15, 6, 4, 11, 13, 6
    cols = []
    for n, (c0, c1) in zip(
            (ry, yg, gc, cb, bm, mr),
            (((255, 0, 0), (255, 255, 0)), ((255, 255, 0), (0, 255, 0)),
             ((0, 255, 0), (0, 255, 255)), ((0, 255, 255), (0, 0, 255)),
             ((0, 0, 255), (255, 0, 255)), ((255, 0, 255), (255, 0, 0)))):
        for i in range(n):
            t = i / n
            cols.append([c0[k] + t * (c1[k] - c0[k]) for k in range(3)])
    return np.asarray(cols, np.float32)          # (55, 3) RGB


def flow_to_color(flow: np.ndarray, max_flow: float | None = None
                  ) -> np.ndarray:
    """(H, W, 2) flow -> (H, W, 3) uint8 RGB, Middlebury convention."""
    u = flow[..., 0].astype(np.float64)
    v = flow[..., 1].astype(np.float64)
    rad = np.hypot(u, v)
    if max_flow is None:
        max_flow = max(float(rad.max()), 1e-9)
    u = u / max_flow
    v = v / max_flow
    rad = np.hypot(u, v)
    wheel = _color_wheel()
    ncols = wheel.shape[0]
    angle = np.arctan2(-v, -u) / np.pi            # [-1, 1]
    fk = (angle + 1.0) / 2.0 * (ncols - 1)        # wheel coordinate
    k0 = np.floor(fk).astype(int) % ncols
    k1 = (k0 + 1) % ncols
    f = fk - np.floor(fk)
    img = np.zeros(flow.shape[:2] + (3,), np.uint8)
    for c in range(3):
        col0 = wheel[k0, c] / 255.0
        col1 = wheel[k1, c] / 255.0
        col = (1 - f) * col0 + f * col1
        small = rad <= 1
        col = np.where(small, 1 - rad * (1 - col), col * 0.75)
        img[..., c] = np.floor(255.0 * col).astype(np.uint8)
    return img


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    from of_dis_tpu.utils import io as uio
    flow = uio.read_flo(argv[0])
    max_flow = float(argv[2]) if len(argv) > 2 else None
    img = flow_to_color(flow[..., :2], max_flow)
    try:
        import cv2
        cv2.imwrite(argv[1], img[..., ::-1])      # BGR for cv2
    except ImportError:
        from PIL import Image
        Image.fromarray(img).save(argv[1])
    return 0


if __name__ == "__main__":
    sys.exit(main())
