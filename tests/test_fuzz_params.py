"""Randomized parameter fuzz: full JAX pipeline vs the full scalar oracle
pipeline over random (but seeded/deterministic) configurations sweeping the
reference's 20-parameter surface jointly — patch size, overlap, cost
function, mean-normalization, early-stop thresholds, TV weights, fbcon.

The per-config oracle tests pin each knob in isolation; this sweeps their
*interactions* (e.g. L1 cost x patnorm=0 x low overlap x loose dp_thresh),
which is where masked-iteration/aggregation bookkeeping bugs would hide.
Budget: the project's <=1% EPE criterion (BASELINE.md), floored at 0.02 px
for near-zero-flow fields, same as tests/test_e2e.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

cv2 = pytest.importorskip("cv2")

from of_dis_tpu.models import dis
from of_dis_tpu.params import DISParams
from tests.oracle import oracle_dis as od
from tests.oracle import oracle_pipeline as op


def _pair(h, w, flow, seed):
    rng = np.random.default_rng(seed)
    big = (rng.random((h + 40, w + 40)) * 255).astype(np.float32)
    big = cv2.GaussianBlur(big, (9, 9), 2.5)
    a = big[20:20 + h, 20:20 + w].copy()
    m = np.float32([[1, 0, flow[0]], [0, 1, flow[1]]])
    bw = cv2.warpAffine(big, m, (w + 40, h + 40))
    b = bw[20:20 + h, 20:20 + w].copy()
    return a[None], b[None]


def _random_config(rng):
    psz = int(rng.choice([4, 8, 12]))
    max_iter = int(rng.integers(3, 13))
    cfg = dict(
        p_samp_s=psz,
        patove=float(rng.uniform(0.1, 0.7)),
        costfct=int(rng.integers(0, 3)),
        patnorm=int(rng.integers(0, 2)),
        max_iter=max_iter,
        min_iter=int(rng.integers(1, max_iter + 1)),
        dp_thresh=float(rng.uniform(0.01, 0.25)),
        dr_thresh=float(rng.uniform(0.8, 1.0)),
        res_thresh=float(rng.choice([0.0, 0.0, 1.0])),
        usetvref=bool(rng.integers(0, 2)),
        usefbcon=bool(rng.integers(0, 2)),
        tv_alpha=float(rng.uniform(5.0, 20.0)),
        tv_gamma=float(rng.uniform(5.0, 20.0)),
        tv_delta=float(rng.uniform(2.0, 8.0)),
        tv_innerit=int(rng.integers(1, 3)),
        tv_solverit=int(rng.integers(1, 4)),
        tv_sor=float(rng.uniform(1.3, 1.9)),
    )
    return cfg


@pytest.mark.parametrize("seed", range(6))
def test_fuzzed_config_matches_oracle(seed):
    rng = np.random.default_rng(1000 + seed)
    cfg = _random_config(rng)
    h, w = 64, 128
    sc_f = int(rng.integers(1, 3))
    flow = (float(rng.uniform(-3, 3)), float(rng.uniform(-2, 2)))
    img_a, img_b = _pair(h, w, flow, seed=2000 + seed)

    prm = DISParams(sc_f=sc_f, sc_l=0, noc=1, nop=2, **cfg)
    flow_jax = np.asarray(dis.dis_flow(jnp.asarray(img_a),
                                       jnp.asarray(img_b), prm, w, h))

    oprm = od.OracleParams(
        psz=cfg["p_samp_s"], max_iter=cfg["max_iter"],
        min_iter=cfg["min_iter"], dp_thresh=cfg["dp_thresh"],
        dr_thresh=cfg["dr_thresh"], res_thresh=cfg["res_thresh"],
        patnorm=cfg["patnorm"], costfct=cfg["costfct"], nop=2)
    flow_orc = op.run_pipeline(
        img_a, img_b, oprm, sc_f=sc_f, sc_l=0, patove=cfg["patove"],
        usetvref=cfg["usetvref"], tv_alpha=cfg["tv_alpha"],
        tv_gamma=cfg["tv_gamma"], tv_delta=cfg["tv_delta"],
        tv_innerit=cfg["tv_innerit"], tv_solverit=cfg["tv_solverit"],
        tv_sor=cfg["tv_sor"], usefbcon=cfg["usefbcon"])

    epe = float(np.hypot(flow_jax[..., 0] - flow_orc[..., 0],
                         flow_jax[..., 1] - flow_orc[..., 1]).mean())
    mag = float(np.hypot(flow_orc[..., 0], flow_orc[..., 1]).mean())
    assert epe < max(0.01 * mag, 0.02), (cfg, sc_f, flow, epe, mag)
