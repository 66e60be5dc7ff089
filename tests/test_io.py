"""Byte-level tests of the .flo/.pfm writers against the reference formats
(reference: run_dense.cpp:17-129)."""

import struct

import numpy as np

from of_dis_tpu.utils import io


def test_flo_roundtrip(tmp_path):
    flow = np.random.default_rng(0).standard_normal((7, 11, 2)).astype(np.float32)
    p = str(tmp_path / "a.flo")
    io.write_flo(p, flow)
    back = io.read_flo(p)
    np.testing.assert_array_equal(back, flow)


def test_flo_header_bytes(tmp_path):
    flow = np.zeros((3, 5, 2), dtype=np.float32)
    p = str(tmp_path / "b.flo")
    io.write_flo(p, flow)
    raw = open(p, "rb").read()
    assert raw[:4] == b"PIEH"
    w, h = struct.unpack("<ii", raw[4:12])
    assert (w, h) == (5, 3)
    assert len(raw) == 12 + 3 * 5 * 2 * 4


def test_flo_single_channel_depth(tmp_path):
    d = np.arange(12, dtype=np.float32).reshape(3, 4, 1)
    p = str(tmp_path / "c.flo")
    io.write_flo(p, d)
    back = io.read_flo(p)
    np.testing.assert_array_equal(back, d)


def test_pfm_roundtrip_and_layout(tmp_path):
    depth = np.random.default_rng(1).standard_normal((5, 9)).astype(np.float32)
    p = str(tmp_path / "d.pfm")
    io.write_pfm(p, depth)
    raw = open(p, "rb").read()
    # header: Pf\n<w> <h>\n-1.000000\n  (printf("%f",-1.0f) — run_dense.cpp:70)
    assert raw.startswith(b"Pf\n9 5\n-1.000000\n")
    body = np.frombuffer(raw, dtype="<f4", offset=len(b"Pf\n9 5\n-1.000000\n"))
    # bottom-up rows of the negated depth (run_dense.cpp:72-77)
    np.testing.assert_array_equal(body.reshape(5, 9), -depth[::-1])
    back = io.read_pfm(p)
    np.testing.assert_array_equal(back, depth)


def test_gradient_magnitude_cli_mode(tmp_path):
    """run_OF_GRD: the reference's dormant SELECTCHANNEL==2 input mode."""
    import cv2
    import numpy as np
    from of_dis_tpu import cli
    from of_dis_tpu.utils import io as uio
    rng = np.random.default_rng(3)
    big = cv2.GaussianBlur((rng.random((160, 200)) * 255).astype(np.float32),
                           (9, 9), 2.5)
    a = big[10:138, 10:170]
    m = np.float32([[1, 0, 2.0], [0, 1, 1.0]])
    b = cv2.warpAffine(big, m, (200, 160))[10:138, 10:170]
    p1, p2 = str(tmp_path / "a.png"), str(tmp_path / "b.png")
    cv2.imwrite(p1, a.astype(np.uint8))
    cv2.imwrite(p2, b.astype(np.uint8))
    out = str(tmp_path / "o.flo")
    cli.main(["run_OF_GRD", p1, p2, out, "1", "--quiet"])
    f = uio.read_flo(out)
    med = np.median(f[20:-20, 20:-20].reshape(-1, 2), axis=0)
    assert abs(med[0] - 2.0) < 0.5 and abs(med[1] - 1.0) < 0.5, med


def test_cli_init_flow(tmp_path):
    """--init-flow extension: warm-start a run from a prior .flo file."""
    import cv2
    import numpy as np
    from of_dis_tpu import cli
    from of_dis_tpu.utils import io as uio
    rng = np.random.default_rng(7)
    big = cv2.GaussianBlur((rng.random((160, 200)) * 255).astype(np.float32),
                           (9, 9), 2.5)
    a = big[10:138, 10:170]
    b = cv2.warpAffine(big, np.float32([[1, 0, 2.0], [0, 1, 1.0]]),
                       (200, 160))[10:138, 10:170]
    p1, p2 = str(tmp_path / "a.png"), str(tmp_path / "b.png")
    cv2.imwrite(p1, a.astype(np.uint8))
    cv2.imwrite(p2, b.astype(np.uint8))
    first = str(tmp_path / "first.flo")
    cli.main(["run_OF_INT", p1, p2, first, "1", "--quiet"])
    warm = str(tmp_path / "warm.flo")
    cli.main(["run_OF_INT", p1, p2, warm, "1", "--quiet",
              "--init-flow", first])
    f = uio.read_flo(warm)
    med = np.median(f[20:-20, 20:-20].reshape(-1, 2), axis=0)
    assert abs(med[0] - 2.0) < 0.5 and abs(med[1] - 1.0) < 0.5, med


def test_flow_to_color():
    """Middlebury color coding: zero flow is white-ish; pure +x flow at the
    normalization radius maps to the wheel's 0-degree color region."""
    import numpy as np
    from of_dis_tpu.utils import viz
    flow = np.zeros((4, 4, 2), np.float32)
    img = viz.flow_to_color(flow, max_flow=1.0)
    assert (img > 240).all()                       # near-white at zero motion
    flow[..., 0] = 1.0
    img = viz.flow_to_color(flow, max_flow=1.0)
    assert img.shape == (4, 4, 3)
    # all pixels identical, saturated hue
    assert (img == img[0, 0]).all() and img[0, 0].min() < 200


def test_init_flow_ingestion_box_mean(tmp_path):
    """The --init-flow downscale is cv::INTER_AREA (box mean,
    run_dense.cpp:376), not point-sampling: a checkerboard u-field must
    average, and a non-divisible size must replicate-pad like the image
    path (run_dense.cpp:302, 369-371)."""
    import numpy as np
    from of_dis_tpu import cli
    from of_dis_tpu.ops import pyramid
    from of_dis_tpu.utils import io as uio

    h, w, sc_f = 101, 167, 2           # not divisible by 2^(sc_f+1)=8
    flow = np.zeros((h, w, 2), np.float32)
    flow[:, ::2, 0] = 10.0             # aliasing bait: point samples see 0/10
    p = str(tmp_path / "init.flo")
    uio.write_flo(p, flow)

    pad_lv = sc_f + 1
    import jax.numpy as jnp
    padded = pyramid.pad_to_divisible(
        jnp.asarray(np.zeros((1, h, w), np.float32)), pad_lv)
    full_h, full_w = padded.shape[1], padded.shape[2]
    got = np.asarray(cli.load_init_flow(p, 2, pad_lv, full_h, full_w, sc_f))
    assert got.shape == (full_h // 8, full_w // 8, 2)
    # value scale 1/8 then 8x8 box mean of the 0/10 columns: every output
    # u is ~5/8 (edge columns replicate slightly off the interior mean)
    interior = got[1:-1, 1:-1, 0]
    assert np.all(np.abs(interior - 10.0 / 2 / 8) < 10.0 / 8 / 8 + 1e-5), (
        interior.min(), interior.max())
    assert np.allclose(got[..., 1], 0.0)


def test_cli_init_flow_resolution_mismatch(tmp_path):
    """--init-flow with a flow file at a different resolution than the
    frames must not die (review finding: a bare assert replaced the old
    any-resolution ingestion): it bilinear-resizes to the frame size."""
    import cv2
    import numpy as np
    from of_dis_tpu import cli
    from of_dis_tpu.utils import io as uio
    rng = np.random.default_rng(3)
    big = cv2.GaussianBlur((rng.random((160, 220)) * 255).astype(np.float32),
                           (9, 9), 2.5)
    a = big[10:138, 10:170]
    b = cv2.warpAffine(big, np.float32([[1, 0, 2.0], [0, 1, 1.0]]),
                       (220, 160))[10:138, 10:170]
    p1, p2 = str(tmp_path / "a.png"), str(tmp_path / "b.png")
    cv2.imwrite(p1, a.astype(np.uint8))
    cv2.imwrite(p2, b.astype(np.uint8))
    half = np.full((64, 80, 2), 1.0, np.float32)
    hp = str(tmp_path / "half.flo")
    uio.write_flo(hp, half)
    out = str(tmp_path / "o.flo")
    cli.main(["run_OF_INT", p1, p2, out, "1", "--quiet", "--init-flow", hp])
    f = uio.read_flo(out)
    med = np.median(f[20:-20, 20:-20].reshape(-1, 2), axis=0)
    assert abs(med[0] - 2.0) < 0.5 and abs(med[1] - 1.0) < 0.5, med
