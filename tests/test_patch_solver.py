"""Batched JAX patch solver vs the scalar NumPy oracle (which transliterates
patch.cpp / patchgrid.cpp control flow)."""

import numpy as np
import pytest

import jax.numpy as jnp

from of_dis_tpu.ops import densify, patch_solver, pyramid
from of_dis_tpu.params import DISParams, make_level_spec
from tests.oracle import oracle_dis as oracle


def _make_pair(h, w, c=1, shift=(2.3, -1.1), seed=0):
    """Smooth random image pair with a known translation."""
    rng = np.random.default_rng(seed)
    big = rng.random((c, h + 32, w + 32)).astype(np.float32) * 255.0
    # blur a bit for a smooth cost surface
    import cv2
    big = np.stack([cv2.GaussianBlur(b, (7, 7), 2.0) for b in big])
    a = big[:, 16:16 + h, 16:16 + w]
    # warpAffine maps dst(x) = src(M^-1 x); M = +shift gives b(x) = a(x-shift),
    # i.e. the flow a->b equals +shift.
    sx, sy = shift
    m = np.float32([[1, 0, sx], [0, 1, sy]])
    b = np.stack([cv2.warpAffine(bb, m, (w + 32, h + 32)) for bb in big])
    b = b[:, 16:16 + h, 16:16 + w]
    return a.copy(), b.copy()


def _level_data(img_a, img_b, psz):
    pad = psz
    ims, dxs, dys = pyramid.build_pyramid(jnp.asarray(img_a), 0, pad)
    imb, dxb, dyb = pyramid.build_pyramid(jnp.asarray(img_b), 0, pad)
    return (np.asarray(ims[0]), np.asarray(dxs[0]), np.asarray(dys[0]),
            np.asarray(imb[0]))


def _run_oracle(spec, prm_np, im_a, dx_a, dy_a, im_b, p_init, camlr=0):
    pts = oracle.grid_layout(spec.width, spec.height, prm_np.psz,
                             0.0)  # patove resolved via steps below
    return pts


@pytest.mark.parametrize("noc,costfct", [(1, 0), (1, 1), (1, 2), (3, 0)])
def test_optimize_level_matches_oracle(noc, costfct):
    h, w, psz = 40, 48, 8
    prm = DISParams(sc_f=0, sc_l=0, max_iter=12, min_iter=12, p_samp_s=psz,
                    patove=0.4, costfct=costfct, noc=noc, nop=2, usetvref=False)
    spec = make_level_spec(0, w, h, prm)
    img_a, img_b = _make_pair(h, w, c=noc)
    im_a, dx_a, dy_a, im_b = _level_data(img_a, img_b, psz)

    tpl = patch_solver.extract_templates(spec, prm, jnp.asarray(im_a),
                                         jnp.asarray(dx_a), jnp.asarray(dy_a))
    n = spec.nopatches
    p_init = jnp.zeros((n, 2), jnp.float32)
    res = patch_solver.optimize_level(spec, prm, jnp.asarray(im_b), tpl, p_init)

    # oracle
    oprm = oracle.OracleParams(psz=psz, max_iter=12, min_iter=12,
                               costfct=costfct, nop=2)
    bounds = (spec.tmp_lb, spec.tmp_ubw, spec.tmp_ubh)
    pts = oracle.grid_layout(w, h, psz, prm.patove)
    assert len(pts) == n
    ps = np.asarray(res.p)
    pws = np.asarray(res.pweight)        # (P, P, N) clamp-summed denominators
    tmpl_o = np.asarray(tpl.tmpl)        # (D, N)
    for ip, (px, py) in enumerate(pts):
        t, gx, gy = oracle.extract_nn(im_a, dx_a, dy_a, px, py, psz, psz, 1)
        np.testing.assert_allclose(tmpl_o[:, ip].reshape(t.shape), t, atol=1e-4)
        hes = oracle.compute_hessian(gx, gy, 2)
        p_o, pw_o, _ = oracle.optimize_patch(
            im_b, t, gx, gy, hes, px, py, np.zeros(2, np.float32), oprm, bounds)
        np.testing.assert_allclose(ps[ip], p_o, atol=2e-3,
                                   err_msg=f"patch {ip} at ({px},{py})")
        # the backend emits the densify denominator sum_c max(w_c, 2)
        # (PatchResult.pweight contract); transform the oracle's raw
        # weights the same way. L1's sqrt(|d|) has unbounded slope at d=0,
        # amplifying the ~1e-3 bf16-split extraction error to ~sqrt(1e-3)
        pw_o_t = np.maximum(np.atleast_3d(pw_o), 2.0).sum(axis=2)
        np.testing.assert_allclose(pws[..., ip], pw_o_t,
                                   atol=(0.04 if costfct == 1 else 5e-3)
                                   * noc)


def test_densify_matches_oracle():
    h, w, psz = 40, 48, 8
    prm = DISParams(sc_f=0, sc_l=0, max_iter=12, min_iter=12, p_samp_s=psz,
                    patove=0.4, noc=1, nop=2, usetvref=False)
    spec = make_level_spec(0, w, h, prm)
    img_a, img_b = _make_pair(h, w, seed=3)
    im_a, dx_a, dy_a, im_b = _level_data(img_a, img_b, psz)
    tpl = patch_solver.extract_templates(spec, prm, jnp.asarray(im_a),
                                         jnp.asarray(dx_a), jnp.asarray(dy_a))
    res = patch_solver.optimize_level(spec, prm, jnp.asarray(im_b), tpl,
                                      jnp.zeros((spec.nopatches, 2)))
    flow = np.asarray(densify.aggregate_flow_dense(spec, prm, res))

    pts = oracle.grid_layout(w, h, psz, prm.patove)
    results = [(np.asarray(res.p)[i], np.asarray(res.pweight)[..., i])
               for i in range(spec.nopatches)]
    flow_o = oracle.aggregate(w, h, psz, 2, pts, results)
    np.testing.assert_allclose(flow, flow_o, atol=1e-4)


def test_flow_recovers_known_shift():
    """End-to-end sanity at one level: flow should approximate the shift."""
    h, w, psz = 64, 96, 8
    shift = (3.2, -2.4)
    prm = DISParams(sc_f=0, sc_l=0, max_iter=16, min_iter=16, p_samp_s=psz,
                    patove=0.4, noc=1, nop=2, usetvref=False)
    spec = make_level_spec(0, w, h, prm)
    img_a, img_b = _make_pair(h, w, shift=shift, seed=7)
    im_a, dx_a, dy_a, im_b = _level_data(img_a, img_b, psz)
    tpl = patch_solver.extract_templates(spec, prm, jnp.asarray(im_a),
                                         jnp.asarray(dx_a), jnp.asarray(dy_a))
    # warm start near truth (single level cannot capture large motion alone)
    p0 = jnp.tile(jnp.asarray([[2.0, -2.0]], jnp.float32), (spec.nopatches, 1))
    res = patch_solver.optimize_level(spec, prm, jnp.asarray(im_b), tpl, p0)
    flow = np.asarray(densify.aggregate_flow_dense(spec, prm, res))
    inner = flow[16:-16, 16:-16]
    med = np.median(inner.reshape(-1, 2), axis=0)
    assert abs(med[0] - shift[0]) < 0.25
    assert abs(med[1] - shift[1]) < 0.25


def test_init_from_coarser_matches_oracle():
    h, w, psz = 32, 40, 8
    prm = DISParams(sc_f=0, sc_l=0, p_samp_s=psz, patove=0.4, nop=2)
    spec = make_level_spec(0, w, h, prm)
    rng = np.random.default_rng(5)
    flow_prev = rng.standard_normal((h // 2, w // 2, 2)).astype(np.float32)
    ours = np.asarray(patch_solver.init_from_coarser(spec, prm,
                                                     jnp.asarray(flow_prev)))
    pts = oracle.grid_layout(w, h, psz, prm.patove)
    ref = oracle.init_from_coarser(pts, flow_prev, w // 2, 2)
    np.testing.assert_array_equal(ours, ref)


def test_depth_mode_matches_oracle():
    h, w, psz = 40, 48, 8
    prm = DISParams(sc_f=0, sc_l=0, max_iter=12, min_iter=12, p_samp_s=psz,
                    patove=0.4, noc=1, nop=1, usetvref=False)
    spec = make_level_spec(0, w, h, prm, camlr=0)
    img_a, img_b = _make_pair(h, w, shift=(-1.7, 0.0), seed=11)
    im_a, dx_a, dy_a, im_b = _level_data(img_a, img_b, psz)
    tpl = patch_solver.extract_templates(spec, prm, jnp.asarray(im_a),
                                         jnp.asarray(dx_a), jnp.asarray(dy_a))
    res = patch_solver.optimize_level(spec, prm, jnp.asarray(im_b), tpl,
                                      jnp.zeros((spec.nopatches, 1)))
    oprm = oracle.OracleParams(psz=psz, max_iter=12, min_iter=12, nop=1)
    bounds = (spec.tmp_lb, spec.tmp_ubw, spec.tmp_ubh)
    pts = oracle.grid_layout(w, h, psz, prm.patove)
    ps = np.asarray(res.p)
    assert (ps <= 0).all()  # camlr=0: disparity clamped non-positive
    for ip, (px, py) in enumerate(pts):
        t, gx, gy = oracle.extract_nn(im_a, dx_a, dy_a, px, py, psz, psz, 1)
        hes = oracle.compute_hessian(gx, gy, 1)
        p_o, _, _ = oracle.optimize_patch(
            im_b, t, gx, gy, hes, px, py, np.zeros(1, np.float32), oprm,
            bounds, camlr=0)
        np.testing.assert_allclose(ps[ip], p_o, atol=2e-3)


def test_chunked_extraction_matches_unchunked(monkeypatch):
    """Forcing the op-4-style patch-chunked XLA extraction must not change
    results (chunk boundary padding + reassembly)."""
    import jax.numpy as jnp

    from of_dis_tpu.params import DISParams, make_level_spec

    h, w, psz = 40, 48, 8
    prm = DISParams(sc_f=0, sc_l=0, max_iter=6, min_iter=6, p_samp_s=psz,
                    patove=0.4, noc=1, nop=2, usetvref=False)
    spec = make_level_spec(0, w, h, prm)
    img_a, img_b = _make_pair(h, w)
    im_a, dx_a, dy_a, im_b = _level_data(img_a, img_b, psz)
    tpl = patch_solver.extract_templates(spec, prm, jnp.asarray(im_a),
                                         jnp.asarray(dx_a), jnp.asarray(dy_a))
    tpl_b = patch_solver.PatchTemplates(*(f[None] for f in tpl))
    n = spec.nopatches
    rng = np.random.default_rng(11)
    p_init = jnp.asarray(rng.standard_normal((1, n, 2)), jnp.float32)
    with monkeypatch.context() as m:
        m.setattr(patch_solver, "_use_pallas_bilerp", lambda: False)
        ref = patch_solver.optimize_level_batched.__wrapped__(
            spec, prm, jnp.asarray(im_b)[None], tpl_b, p_init)
        m.setattr(patch_solver, "_XLA_T_BUDGET", 1)   # force chunking
        got = patch_solver.optimize_level_batched.__wrapped__(
            spec, prm, jnp.asarray(im_b)[None], tpl_b, p_init)
    # the chunk-shaped dot rounds differently (~1.5e-5 on extraction);
    # GN amplifies that through convergence branches
    np.testing.assert_allclose(np.asarray(got.p), np.asarray(ref.p),
                               rtol=0, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got.pweight),
                               np.asarray(ref.pweight), rtol=0, atol=2e-2)


def test_init_oob_patch_pinned_semantics():
    """Pin the documented init-OOB deviation (patch_solver module docstring;
    reference: patch.cpp:133-139): a patch whose *initial* position is fully
    out of bounds must (a) keep p = p_init (no iterations run), (b) report
    pdiff = template, and (c) report pweight = the cost-weight formula
    applied to the template — NOT the reference's uninitialized buffer.
    A refactor that drifts any of these breaks this test."""
    h, w, psz = 40, 48, 8
    prm = DISParams(sc_f=0, sc_l=0, max_iter=12, min_iter=1, p_samp_s=psz,
                    patove=0.4, costfct=0, noc=1, nop=2, usetvref=False)
    spec = make_level_spec(0, w, h, prm)
    img_a, img_b = _make_pair(h, w)
    im_a, dx_a, dy_a, im_b = _level_data(img_a, img_b, psz)
    tpl = patch_solver.extract_templates(spec, prm, jnp.asarray(im_a),
                                         jnp.asarray(dx_a), jnp.asarray(dy_a))
    n = spec.nopatches
    # push patch 0 far out of bounds at init; leave the rest at zero
    p_init = np.zeros((n, 2), np.float32)
    p_init[0] = (1e4, 1e4)
    res = patch_solver.optimize_level(spec, prm, jnp.asarray(im_b), tpl,
                                      jnp.asarray(p_init))
    # (a) parameters unchanged from init
    np.testing.assert_allclose(np.asarray(res.p)[0], p_init[0])
    # (c) pweight == clamp-summed cost-weight(template) for the L2 cost:
    # max(|template|, MINERRVAL) (PatchResult.pweight contract)
    tmpl0 = np.asarray(tpl.tmpl)[:, 0]
    _, want_pw = patch_solver.loss_error_image(jnp.asarray(tmpl0)[:, None],
                                               prm.costfct)
    got_pw = np.asarray(res.pweight).reshape(psz * psz, n)[:, 0]
    np.testing.assert_allclose(got_pw,
                               np.maximum(np.asarray(want_pw)[:, 0], 2.0),
                               rtol=1e-6)
    # in-bounds patches are unaffected by the OOB one
    p_init2 = np.zeros((n, 2), np.float32)
    res2 = patch_solver.optimize_level(spec, prm, jnp.asarray(im_b), tpl,
                                       jnp.asarray(p_init2))
    np.testing.assert_allclose(np.asarray(res.p)[1:], np.asarray(res2.p)[1:],
                               atol=1e-6)
