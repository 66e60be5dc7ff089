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


def decode_batch(paths, channels: int, nthreads: int = 8,
                 dtype=np.float32) -> np.ndarray:
    """Threaded batch decode -> (B, C, H, W).

    dtype=np.uint8 decodes straight to the device-transfer format (4x
    smaller, bit-exact for the 8-bit sources this decoder handles); the
    default float32 matches the classic loaders."""
    want_u8 = np.dtype(dtype) == np.uint8
    try:
        w, h, payload = _n.decode_batch(list(paths), channels, nthreads,
                                        want_u8)
        got_u8 = want_u8
    except TypeError:   # pre-u8 extension build: f32 only
        w, h, payload = _n.decode_batch(list(paths), channels, nthreads)
        got_u8 = False
    arr = np.frombuffer(
        payload, dtype=np.uint8 if got_u8 else np.float32).reshape(
        len(paths), channels, h, w)
    return arr.astype(np.uint8) if want_u8 and not got_u8 else arr.copy()
