"""Model-level feature tests: forward-backward merge, depth pipeline,
sequence warm-start chaining, timed path, init-flow input."""

import numpy as np
import pytest

import jax.numpy as jnp

cv2 = pytest.importorskip("cv2")

from of_dis_tpu.models import dis
from of_dis_tpu.params import DISParams
from tests.test_e2e import _pair


def test_fbcon_runs_and_recovers_flow():
    h, w = 64, 128
    true = (2.0, -1.0)
    a, b = _pair(h, w, flow=true, seed=9)
    prm = DISParams(sc_f=2, sc_l=0, max_iter=8, min_iter=8, p_samp_s=8,
                    patove=0.4, noc=1, nop=2, usetvref=True, usefbcon=True)
    flow = np.asarray(dis.dis_flow(jnp.asarray(a), jnp.asarray(b), prm, w, h))
    inner = flow[12:-12, 12:-12]
    err = np.hypot(inner[..., 0] - true[0], inner[..., 1] - true[1]).mean()
    assert err < 0.35, err


def test_fbcon_matches_oracle():
    from tests.oracle import oracle_dis as od
    from tests.oracle import oracle_pipeline as op
    h, w = 32, 64
    a, b = _pair(h, w, flow=(1.5, 0.5), seed=10)
    prm = DISParams(sc_f=0, sc_l=0, max_iter=6, min_iter=6, p_samp_s=8,
                    patove=0.4, noc=1, nop=2, usetvref=False, usefbcon=True)
    flow = np.asarray(dis.dis_flow(jnp.asarray(a), jnp.asarray(b), prm, w, h))
    oprm = od.OracleParams(psz=8, max_iter=6, min_iter=6)
    flow_o = op.run_pipeline(a, b, oprm, sc_f=0, sc_l=0, patove=0.4,
                             usetvref=False, usefbcon=True)
    d = np.hypot(flow[..., 0] - flow_o[..., 0], flow[..., 1] - flow_o[..., 1])
    assert np.median(d) < 1e-3
    assert d.mean() < 0.02


def test_depth_pipeline_end_to_end():
    h, w = 64, 128
    # negative-x shift -> negative disparity, allowed for camlr=0
    a, b = _pair(h, w, flow=(-2.5, 0.0), seed=11)
    prm = DISParams(sc_f=2, sc_l=0, max_iter=8, min_iter=8, p_samp_s=8,
                    patove=0.4, noc=1, nop=1, usetvref=True)
    d = np.asarray(dis.dis_flow(jnp.asarray(a), jnp.asarray(b), prm, w, h))
    assert d.shape == (h, w, 1)
    med = np.median(d[12:-12, 12:-12])
    assert abs(med - (-2.5)) < 0.5, med
    assert (d <= 0).all()


def test_sequence_warm_start():
    h, w = 32, 64
    rng = np.random.default_rng(12)
    big = cv2.GaussianBlur((rng.random((h + 60, w + 60)) * 255
                            ).astype(np.float32), (9, 9), 2.5)
    frames = []
    for t in range(4):
        m = np.float32([[1, 0, 1.5 * t], [0, 1, 0.5 * t]])
        f = cv2.warpAffine(big, m, (w + 60, h + 60))[30:30 + h, 30:30 + w]
        frames.append(f[None])
    frames = jnp.asarray(np.stack(frames))
    prm = DISParams(sc_f=1, sc_l=0, max_iter=8, min_iter=8, p_samp_s=8,
                    patove=0.4, noc=1, nop=2, usetvref=True)
    flows = np.asarray(dis.dis_sequence(frames, prm, w, h))
    assert flows.shape == (3, h, w, 2)
    for t in range(3):
        inner = flows[t, 8:-8, 8:-8]
        err = np.hypot(inner[..., 0] - 1.5, inner[..., 1] - 0.5).mean()
        assert err < 0.5, (t, err)
    # batched sequence mode: two identical streams reproduce the
    # single-stream result
    fb = np.asarray(dis.dis_sequence_batched(
        jnp.stack([frames, frames], axis=1), prm, w, h))
    assert fb.shape == (3, 2, h, w, 2)
    np.testing.assert_allclose(fb[:, 0], flows, rtol=0, atol=1e-4)
    np.testing.assert_array_equal(fb[:, 0], fb[:, 1])


def test_init_flow_input():
    h, w = 32, 64
    a, b = _pair(h, w, flow=(2.0, 1.0), seed=13)
    prm = DISParams(sc_f=1, sc_l=0, max_iter=4, min_iter=4, p_samp_s=8,
                    patove=0.4, noc=1, nop=2, usetvref=False)
    k = 2 ** (prm.sc_f + 1)
    init = jnp.full((h // k, w // k, 2), 0.5, jnp.float32)  # value at sc_f+1
    flow = np.asarray(dis.dis_flow(jnp.asarray(a), jnp.asarray(b), prm, w, h,
                                   init_flow=init))
    assert flow.shape == (h, w, 2)


def test_timed_path_matches_fused(capsys):
    h, w = 32, 64
    a, b = _pair(h, w, flow=(1.0, 0.5), seed=14)
    prm = DISParams(sc_f=1, sc_l=0, max_iter=4, min_iter=4, p_samp_s=8,
                    patove=0.4, noc=1, nop=2, usetvref=True)
    f1 = np.asarray(dis.dis_flow(jnp.asarray(a), jnp.asarray(b), prm, w, h))
    f2 = np.asarray(dis.dis_flow_timed(jnp.asarray(a), jnp.asarray(b), prm,
                                       w, h))
    out = capsys.readouterr().out
    assert "pconst, pinit, poptim, cflow, tvopt" in out
    d = np.hypot(f1[..., 0] - f2[..., 0], f1[..., 1] - f2[..., 1])
    assert np.median(d) < 1e-4
