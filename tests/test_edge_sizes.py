"""Shape-robustness: the CLI end-to-end on odd, tiny, and non-divisible
frame sizes across modes. The reference handles arbitrary sizes by padding
to 2^lv_f divisibility (run_dense.cpp:299-312) and auto-selecting the
coarsest scale from the width (run_dense.cpp:181-184); these tests drive
the same surface through of_dis_tpu.cli and assert the output files come
back at the input resolution with finite values.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from of_dis_tpu import cli
from of_dis_tpu.utils import io


def _frames(tmp_path, h, w, noc, flow=(1.5, 0.5), seed=0):
    rng = np.random.default_rng(seed)
    big = (rng.random((h + 40, w + 40, noc)) * 255).astype(np.float32)
    big = cv2.GaussianBlur(big, (9, 9), 2.5).reshape(h + 40, w + 40, noc)
    a = big[20:20 + h, 20:20 + w]
    m = np.float32([[1, 0, flow[0]], [0, 1, flow[1]]])
    b = cv2.warpAffine(big, m, (w + 40, h + 40)).reshape(
        h + 40, w + 40, noc)[20:20 + h, 20:20 + w]
    p1 = str(tmp_path / "a.png")
    p2 = str(tmp_path / "b.png")
    cv2.imwrite(p1, a.astype(np.uint8))
    cv2.imwrite(p2, b.astype(np.uint8))
    return p1, p2


# odd/prime-ish dims, a sub-patch-size-steps tiny frame, and a w<h portrait
@pytest.mark.parametrize("h,w", [(33, 47), (41, 129), (97, 61)])
def test_flow_cli_odd_sizes(tmp_path, h, w):
    p1, p2 = _frames(tmp_path, h, w, 1)
    out = str(tmp_path / "out.flo")
    cli.main(["run_OF_INT", p1, p2, out, "2", "--quiet"])
    f = io.read_flo(out)
    assert f.shape == (h, w, 2)
    assert np.isfinite(f).all()


def test_rgb_cli_odd_size(tmp_path):
    h, w = 45, 83
    p1, p2 = _frames(tmp_path, h, w, 3)
    out = str(tmp_path / "out.flo")
    cli.main(["run_OF_RGB", p1, p2, out, "1", "--quiet"])
    f = io.read_flo(out)
    assert f.shape == (h, w, 2)
    assert np.isfinite(f).all()


def test_depth_cli_odd_size(tmp_path):
    h, w = 39, 101
    # negative-x shift -> negative disparity, valid for the left camera
    p1, p2 = _frames(tmp_path, h, w, 1, flow=(-2.0, 0.0))
    out = str(tmp_path / "out.pfm")
    cli.main(["run_DE_INT", p1, p2, out, "2", "--quiet"])
    d = io.read_pfm(out)
    assert d.shape[:2] == (h, w)
    assert np.isfinite(d).all()


def test_flow_cli_recovers_translation_odd_size(tmp_path):
    h, w = 77, 115
    true = (2.0, 1.0)
    p1, p2 = _frames(tmp_path, h, w, 1, flow=true, seed=3)
    out = str(tmp_path / "out.flo")
    cli.main(["run_OF_INT", p1, p2, out, "2", "--quiet"])
    f = io.read_flo(out)
    inner = f[12:-12, 12:-12]
    err = np.hypot(inner[..., 0] - true[0], inner[..., 1] - true[1]).mean()
    assert err < 0.4, err
