"""End-to-end parity against golden outputs of the COMPILED C++ reference.

The goldens in tests/goldens/ were produced by the reference binaries
(lordnn/OF_DIS, built from /root/reference with SSE, OpenMP off) on the
committed synthetic images. Acceptance: mean EPE within 1% of the golden's
mean flow magnitude (BASELINE.md), except op-point 1 (no TV refinement)
which must match to float noise — its entire pipeline is sweep-order-free.

Golden generation (documented for regeneration): each binary was invoked as
  run_OF_INT a.png b.png of_int_op1.flo 1
  run_OF_INT a.png b.png of_int_op2.flo 2
  run_OF_RGB ac.png bc.png of_rgb_op2.flo 2
  run_DE_INT a.png bs.png de_int_op2.pfm 2
  run_DE_RGB asc.png bsc.png de_rgb_op2.pfm 2
  run_OF_INT a.png b.png of_int_l1_fb.flo 3 1 12 12 0.05 0.95 0 8 0.4 1 1 1 1 10 10 5 1 3 1.6 0
  run_OF_INT a.png b.png of_int_huber_notv.flo 3 1 12 12 0.05 0.95 0 8 0.4 0 1 2 0 10 10 5 1 3 1.6 0
  run_OF_INT a.png b.png of_int_op3.flo 3
  run_OF_INT a.png b.png of_int_op4.flo 4
  run_OF_RGB ac.png bc.png of_rgb_op3.flo 3
  run_OF_GRD a.png b.png of_grd_op2.flo 2      # SELECTCHANNEL=2 build
  run_OF_GRD a.png b.png of_grd_op3.flo 3
  run_DE_INT a.png bs.png de_int_op3.pfm 3
  run_DE_GRD a.png bs.png de_grd_op2.pfm 2     # SELECTMODE=2 SELECTCHANNEL=2 build
  run_DE_INT a.png bs.png de_int_l2_fb.pfm 3 1 12 12 0.05 0.95 0 8 0.4 1 1 0 1 10 10 5 1 3 1.6 0

Binaries reproducible via tools/build_reference.sh (the rebuilt run_OF_INT
regenerates of_int_op2.flo byte-identically).
"""

import os

import numpy as np
import pytest

from of_dis_tpu import cli
from of_dis_tpu.utils import io

G = os.path.join(os.path.dirname(__file__), "goldens")


def _epe_ratio(ours, ref):
    d = np.hypot(ours[..., 0] - ref[..., 0], ours[..., 1] - ref[..., 1])
    mag = np.hypot(ref[..., 0], ref[..., 1]).mean()
    return d.mean() / mag


def _run(mode, img1, img2, out, args):
    cli.main([mode, os.path.join(G, img1), os.path.join(G, img2), out]
             + args)


@pytest.mark.parametrize("op,budget", [(1, 1e-4), (2, 0.01), (3, 0.01),
                                       (4, 0.01)])
def test_of_int_op_points(tmp_path, op, budget):
    out = str(tmp_path / "out.flo")
    _run("run_OF_INT", "a.png", "b.png", out, [str(op), "--quiet"])
    ratio = _epe_ratio(io.read_flo(out),
                       io.read_flo(os.path.join(G, f"of_int_op{op}.flo")))
    assert ratio < budget, ratio


def test_of_rgb_op3(tmp_path):
    out = str(tmp_path / "out.flo")
    _run("run_OF_RGB", "ac.png", "bc.png", out, ["3", "--quiet"])
    ratio = _epe_ratio(io.read_flo(out),
                       io.read_flo(os.path.join(G, "of_rgb_op3.flo")))
    assert ratio < 0.01, ratio


@pytest.mark.parametrize("op", [2, 3])
def test_of_grd_op_points(tmp_path, op):
    """Gradient-magnitude input mode (SELECTCHANNEL=2, run_dense.cpp:139-148):
    goldens from the reference compiled with -DSELECTCHANNEL=2."""
    out = str(tmp_path / "out.flo")
    _run("run_OF_GRD", "a.png", "b.png", out, [str(op), "--quiet"])
    ratio = _epe_ratio(io.read_flo(out),
                       io.read_flo(os.path.join(G, f"of_grd_op{op}.flo")))
    assert ratio < 0.01, ratio


def test_of_rgb_op2(tmp_path):
    out = str(tmp_path / "out.flo")
    _run("run_OF_RGB", "ac.png", "bc.png", out, ["2", "--quiet"])
    ratio = _epe_ratio(io.read_flo(out),
                       io.read_flo(os.path.join(G, "of_rgb_op2.flo")))
    assert ratio < 0.01, ratio


def test_de_int_op2(tmp_path):
    out = str(tmp_path / "out.pfm")
    _run("run_DE_INT", "a.png", "bs.png", out, ["2", "--quiet"])
    ours = io.read_pfm(out)
    ref = io.read_pfm(os.path.join(G, "de_int_op2.pfm"))
    ratio = np.abs(ours - ref).mean() / np.abs(ref).mean()
    assert ratio < 0.01, ratio


def test_de_int_op3(tmp_path):
    """Depth op-point 3 (psz 12 fine levels through the tiled GN kernel):
    the op-point switch is mode-generic (run_dense.cpp:240-268)."""
    out = str(tmp_path / "out.pfm")
    _run("run_DE_INT", "a.png", "bs.png", out, ["3", "--quiet"])
    ours = io.read_pfm(out)
    ref = io.read_pfm(os.path.join(G, "de_int_op3.pfm"))
    ratio = np.abs(ours - ref).mean() / np.abs(ref).mean()
    assert ratio < 0.01, ratio


def test_de_int_fbcon(tmp_path):
    """Depth + forward-backward merge via the 20-param form: the backward
    bilinear splat is mode-generic too (patchgrid.cpp:278-375)."""
    out = str(tmp_path / "out.pfm")
    _run("run_DE_INT", "a.png", "bs.png", out,
         "3 1 12 12 0.05 0.95 0 8 0.4 1 1 0 1 10 10 5 1 3 1.6 0".split())
    ours = io.read_pfm(out)
    ref = io.read_pfm(os.path.join(G, "de_int_l2_fb.pfm"))
    ratio = np.abs(ours - ref).mean() / np.abs(ref).mean()
    assert ratio < 0.01, ratio


def test_de_rgb_op2(tmp_path):
    out = str(tmp_path / "out.pfm")
    _run("run_DE_RGB", "asc.png", "bsc.png", out, ["2", "--quiet"])
    ours = io.read_pfm(out)
    ref = io.read_pfm(os.path.join(G, "de_rgb_op2.pfm"))
    ratio = np.abs(ours - ref).mean() / np.abs(ref).mean()
    assert ratio < 0.01, ratio


def test_de_grd_op2(tmp_path):
    """Depth + gradient-magnitude input (SELECTMODE=2, SELECTCHANNEL=2):
    dormant in the reference (no CMake target, run_dense.cpp:139-148 +
    the depth branch at 240-268), but buildable — golden from the
    -DSELECTMODE=2 -DSELECTCHANNEL=2 reference build
    (tools/build_reference.sh run_DE_GRD)."""
    out = str(tmp_path / "out.pfm")
    _run("run_DE_GRD", "a.png", "bs.png", out, ["2", "--quiet"])
    ours = io.read_pfm(out)
    ref = io.read_pfm(os.path.join(G, "de_grd_op2.pfm"))
    ratio = np.abs(ours - ref).mean() / np.abs(ref).mean()
    assert ratio < 0.01, ratio


def test_of_int_l1_fbcon(tmp_path):
    """L1 cost + forward-backward merge via the explicit 20-param form."""
    out = str(tmp_path / "out.flo")
    _run("run_OF_INT", "a.png", "b.png", out,
         "3 1 12 12 0.05 0.95 0 8 0.4 1 1 1 1 10 10 5 1 3 1.6 0".split())
    ratio = _epe_ratio(io.read_flo(out),
                       io.read_flo(os.path.join(G, "of_int_l1_fb.flo")))
    assert ratio < 0.01, ratio


def test_of_int_huber_no_tv(tmp_path):
    """Pseudo-Huber cost, TV off: sweep-order-free, float-noise budget."""
    out = str(tmp_path / "out.flo")
    _run("run_OF_INT", "a.png", "b.png", out,
         "3 1 12 12 0.05 0.95 0 8 0.4 0 1 2 0 10 10 5 1 3 1.6 0".split())
    ratio = _epe_ratio(io.read_flo(out),
                       io.read_flo(os.path.join(G, "of_int_huber_notv.flo")))
    assert ratio < 1e-3, ratio
