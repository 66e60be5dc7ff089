"""Python wrappers over the _native_io C extension.

Raise ImportError on import if the extension is not built; utils.io catches
this and falls back to pure Python.
"""

from __future__ import annotations

import numpy as np

from of_dis_tpu.native import _native_io as _n


def write_flo(path: str, data: np.ndarray) -> None:
    data = np.ascontiguousarray(data, dtype=np.float32)
    h, w, nc = data.shape
    _n.write_flo_raw(path, data.tobytes(), w, h, nc)


def read_flo(path: str) -> np.ndarray:
    w, h, payload = _n.read_flo_raw(path)
    arr = np.frombuffer(payload, dtype=np.float32)
    nc = arr.size // (w * h)
    return arr.reshape(h, w, nc).copy()


def write_pfm(path: str, depth: np.ndarray) -> None:
    depth = np.ascontiguousarray(depth, dtype=np.float32)
    h, w = depth.shape
    _n.write_pfm_raw(path, depth.tobytes(), w, h)


def decode_image(path: str, channels: int) -> np.ndarray:
    """Decode PNG/PGM/PPM to float32 (C, H, W); gray conversion matches
    cv::imread(GRAYSCALE), color order is BGR like cv::imread(COLOR)."""
    w, h, payload = _n.decode_image(path, channels)
    return np.frombuffer(payload, dtype=np.float32).reshape(
        channels, h, w).copy()


def decode_batch(paths, channels: int, nthreads: int = 8) -> np.ndarray:
    """Threaded batch decode -> float32 (B, C, H, W)."""
    w, h, payload = _n.decode_batch(list(paths), channels, nthreads)
    b = len(paths)
    return np.frombuffer(payload, dtype=np.float32).reshape(
        b, channels, h, w).copy()
