"""Flow/depth/image file I/O.

Byte-compatible with the reference writers/readers:
  - `.flo`: "PIEH" magic + int32 width/height + row-major float32 payload with
    1 (depth), 2 (flow) or 4 (scene flow) channels (reference: run_dense.cpp:17-58).
  - `.pfm`: "Pf" header, bottom-up rows, NEGATED depth values, scale -1.0
    written via printf("%f") (reference: run_dense.cpp:61-82).
  - image loading via OpenCV when available (matching the reference's
    cv::imread grayscale/color conversion, run_dense.cpp:200-210), with a PIL
    fallback.

If the native C extension (of_dis_tpu.native) is built, its fast writers are
used transparently for large payloads.
"""

from __future__ import annotations

import struct


import numpy as np

try:
    from of_dis_tpu.native import io as _native_io  # optional C++ fast path
except Exception:  # pragma: no cover - extension optional
    _native_io = None

_FLO_MAGIC = b"PIEH"


def write_flo(path: str, data: np.ndarray) -> None:
    """Write a (H, W, C) float32 array as .flo (reference: run_dense.cpp:17-58)."""
    data = np.ascontiguousarray(data, dtype=np.float32)
    if data.ndim == 2:
        data = data[:, :, None]
    h, w, nc = data.shape
    assert nc in (1, 2, 4), f"flo supports 1/2/4 channels, got {nc}"
    if _native_io is not None:
        _native_io.write_flo(path, data)
        return
    with open(path, "wb") as f:
        f.write(_FLO_MAGIC)
        f.write(struct.pack("<ii", w, h))
        f.write(data.tobytes())


def read_flo(path: str) -> np.ndarray:
    """Read a .flo file, inferring channel count from the payload size
    (reference reader fixes nc from the target Mat; we infer: run_dense.cpp:85-129)."""
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:4] != _FLO_MAGIC:
        raise ValueError(f"{path}: bad .flo magic {raw[:4]!r}")
    w, h = struct.unpack("<ii", raw[4:12])
    payload = np.frombuffer(raw, dtype=np.float32, offset=12)
    nc = payload.size // (w * h)
    if nc * w * h != payload.size or nc not in (1, 2, 4):
        raise ValueError(f"{path}: payload size {payload.size} != {w}x{h}xC")
    return payload.reshape(h, w, nc).copy()


def write_pfm(path: str, depth: np.ndarray) -> None:
    """Write a (H, W) float32 depth map as .pfm, negated + bottom-up
    (reference: run_dense.cpp:61-82). Header scale is "-1.000000" to match
    printf("%f", -1.0f)."""
    depth = np.ascontiguousarray(depth, dtype=np.float32)
    if depth.ndim == 3:
        depth = depth[:, :, 0]
    h, w = depth.shape
    if _native_io is not None:
        _native_io.write_pfm(path, depth)
        return
    with open(path, "wb") as f:
        f.write(b"Pf\n%d %d\n%f\n" % (w, h, -1.0))
        f.write((-depth[::-1]).tobytes())


def read_pfm(path: str) -> np.ndarray:
    """Read a .pfm written by `write_pfm` (returns the un-negated depth)."""
    with open(path, "rb") as f:
        magic = f.readline().strip()
        if magic != b"Pf":
            raise ValueError(f"{path}: expected grayscale Pf, got {magic!r}")
        w, h = map(int, f.readline().split())
        scale = float(f.readline())
        data = np.frombuffer(f.read(), dtype="<f4" if scale < 0 else ">f4",
                             count=h * w)
    return (-data.reshape(h, w)[::-1]).copy()


def load_image(path: str, channels: int = 1) -> np.ndarray:
    """Load an image as float32 (C, H, W).

    channels=1: grayscale (cv2 BGR2GRAY weights, as cv::imread(GRAYSCALE)),
    channels=3: color in BGR order (as cv::imread(COLOR)); channel order does
    not affect the algorithm (channels are treated symmetrically).
    Reference: run_dense.cpp:200-210, 327-328.

    Uses the native C++ decoder (PNG/PGM/PPM) when built; falls back to
    OpenCV, then PIL.
    """
    if _native_io is not None:
        try:
            return _native_io.decode_image(path, channels)
        except ValueError:
            pass  # unsupported format for the native decoder
    try:
        import cv2
        flag = cv2.IMREAD_GRAYSCALE if channels == 1 else cv2.IMREAD_COLOR
        img = cv2.imread(path, flag)
        if img is None:
            raise FileNotFoundError(path)
        if channels == 1:
            img = img[None, :, :]
        else:
            img = img.transpose(2, 0, 1)
        return img.astype(np.float32)
    except ImportError:  # pragma: no cover
        from PIL import Image
        im = Image.open(path)
        if channels == 1:
            im = im.convert("L")
            return np.asarray(im, dtype=np.float32)[None]
        im = im.convert("RGB")
        arr = np.asarray(im, dtype=np.float32).transpose(2, 0, 1)
        return arr[::-1].copy()  # to BGR for parity with cv::imread
