"""The fused Pallas Gauss-Newton level kernel must match the pure-XLA
while-loop path of optimize_level_batched.

On CPU the kernel runs in Pallas interpret mode; on TPU it compiles via
Mosaic (covered by the TPU bench/driver runs and tools/smoke_tpu.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from of_dis_tpu.ops import patch_solver
from of_dis_tpu.params import DISParams, make_level_spec
from tests.test_patch_solver import _level_data, _make_pair


def _run(prm, spec, img_a, img_b, p_init, fused: bool, monkeypatch):
    psz = prm.p_samp_s
    im_a, dx_a, dy_a, im_b = _level_data(img_a, img_b, psz)
    tpl = patch_solver.extract_templates(spec, prm, jnp.asarray(im_a),
                                         jnp.asarray(dx_a), jnp.asarray(dy_a))
    tpl_b = patch_solver.PatchTemplates(*(f[None] for f in tpl))
    with monkeypatch.context() as m:
        if fused:
            from jax.experimental import pallas as pl
            orig = pl.pallas_call

            def patched(*args, **kw):
                kw.setdefault("interpret", True)
                return orig(*args, **kw)

            m.setattr(pl, "pallas_call", patched)
            m.setattr(patch_solver, "_use_pallas_bilerp", lambda: True)
        else:
            m.setattr(patch_solver, "_use_pallas_bilerp", lambda: False)
        # bypass the jit cache: it would memoize across the monkeypatch
        res = patch_solver.optimize_level_batched.__wrapped__(
            spec, prm, jnp.asarray(im_b)[None], tpl_b, p_init[None])
    return res


@pytest.mark.parametrize("noc,costfct,patnorm",
                         [(1, 0, 1), (1, 1, 1), (1, 2, 0), (3, 0, 1)])
def test_gn_fused_matches_xla_flow(monkeypatch, noc, costfct, patnorm):
    h, w, psz = 40, 48, 8
    prm = DISParams(sc_f=0, sc_l=0, max_iter=12, min_iter=12, p_samp_s=psz,
                    patove=0.4, costfct=costfct, patnorm=patnorm, noc=noc,
                    nop=2, usetvref=False)
    spec = make_level_spec(0, w, h, prm)
    img_a, img_b = _make_pair(h, w, c=noc)
    n = spec.nopatches
    rng = np.random.default_rng(3)
    # nonzero inits so resets/convergence branches are exercised
    p_init = jnp.asarray(rng.standard_normal((n, 2)) * 1.5, jnp.float32)
    ref = _run(prm, spec, img_a, img_b, p_init, False, monkeypatch)
    got = _run(prm, spec, img_a, img_b, p_init, True, monkeypatch)
    assert patch_solver._pick_gn_bb(
        1, psz + 1, noc, patch_solver._gn_windows(psz, spec.padded_height)[1],
        spec.padded_width, psz * psz * noc, n) is not None
    np.testing.assert_allclose(np.asarray(got.p), np.asarray(ref.p),
                               rtol=0, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got.pt), np.asarray(ref.pt),
                               rtol=0, atol=5e-4)
    # L1/Huber weights are sqrt(|diff|)-shaped: float noise in a near-zero
    # residual amplifies to ~1e-2 in the weight
    np.testing.assert_allclose(np.asarray(got.pweight),
                               np.asarray(ref.pweight), rtol=0, atol=2e-2)


@pytest.mark.parametrize("camlr", [0, 1])
def test_gn_fused_matches_xla_depth(monkeypatch, camlr):
    h, w, psz = 40, 48, 8
    shift = (-2.3, 0.0) if camlr == 0 else (2.3, 0.0)
    prm = DISParams(sc_f=0, sc_l=0, max_iter=8, min_iter=8, p_samp_s=psz,
                    patove=0.4, noc=1, nop=1, usetvref=False)
    spec = make_level_spec(0, w, h, prm, camlr=camlr)
    img_a, img_b = _make_pair(h, w, c=1, shift=shift)
    n = spec.nopatches
    p_init = jnp.zeros((n, 1), jnp.float32)
    ref = _run(prm, spec, img_a, img_b, p_init, False, monkeypatch)
    got = _run(prm, spec, img_a, img_b, p_init, True, monkeypatch)
    np.testing.assert_allclose(np.asarray(got.p), np.asarray(ref.p),
                               rtol=0, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got.pweight),
                               np.asarray(ref.pweight), rtol=0, atol=5e-3)


def test_upscale_pallas_matches_xla(monkeypatch):
    """The Pallas upscale kernel must match the XLA matmul-resize path."""
    from jax.experimental import pallas as pl

    import jax

    from of_dis_tpu.models import dis
    from of_dis_tpu.ops import pyramid as pyr

    rng = np.random.default_rng(7)
    flow_cf = jnp.asarray(rng.standard_normal((4, 2, 14, 32)) * 3,
                          jnp.float32)
    orig = pl.pallas_call

    def patched(*args, **kw):
        kw.setdefault("interpret", True)
        return orig(*args, **kw)

    with monkeypatch.context() as m:
        m.setattr(pl, "pallas_call", patched)
        got = dis._upscale_cf_pallas(flow_cf, 112, 256, 8.0)
    assert got is not None
    ref = jax.vmap(lambda x: pyr.resize_linear(x * 8.0, 112, 256))(flow_cf)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=2e-3)


def test_gn_fused_nblocked_matches_xla(monkeypatch):
    """Oversized-level path: patch-axis blocking with far-oob padding must
    match the XLA path (forced via small nb so padding is exercised)."""
    h, w, psz = 40, 48, 8
    prm = DISParams(sc_f=0, sc_l=0, max_iter=8, min_iter=8, p_samp_s=psz,
                    patove=0.4, noc=1, nop=2, usetvref=False)
    spec = make_level_spec(0, w, h, prm)
    img_a, img_b = _make_pair(h, w)
    n = spec.nopatches
    assert n % 64 != 0    # padding must actually be exercised (n=120)
    rng = np.random.default_rng(9)
    p_init = jnp.asarray(rng.standard_normal((n, 2)) * 1.5, jnp.float32)
    ref = _run(prm, spec, img_a, img_b, p_init, False, monkeypatch)
    with monkeypatch.context() as m:
        m.setattr(patch_solver, "_pick_gn_bb",
                  lambda *a, **k: None)
        m.setattr(patch_solver, "_pick_gn_nb",
                  lambda *a, **k: 64)   # n=120 -> padded to 128, 2 blocks
        got = _run(prm, spec, img_a, img_b, p_init, True, monkeypatch)
    np.testing.assert_allclose(np.asarray(got.p), np.asarray(ref.p),
                               rtol=0, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got.pweight),
                               np.asarray(ref.pweight), rtol=0, atol=2e-2)


def test_gn_fused_extraction_cache_long_loop(monkeypatch):
    """max_iter >= 32 enables the cross-iteration extraction cache in the
    batch-blocked kernel (the op-4 coarse-level configuration); results
    must still match the XLA path exactly."""
    h, w, psz = 40, 48, 8
    prm = DISParams(sc_f=0, sc_l=0, max_iter=32, min_iter=32, p_samp_s=psz,
                    patove=0.4, costfct=0, patnorm=1, noc=1, nop=2,
                    usetvref=False)
    spec = make_level_spec(0, w, h, prm)
    img_a, img_b = _make_pair(h, w, c=1)
    p_init = jnp.zeros((spec.nopatches, 2), jnp.float32)
    want = _run(prm, spec, img_a, img_b, p_init, False, monkeypatch)
    got = _run(prm, spec, img_a, img_b, p_init, True, monkeypatch)
    np.testing.assert_allclose(np.asarray(got.p), np.asarray(want.p),
                               rtol=1e-4, atol=2e-3)


def test_gn_fused_iters_matches_xla(monkeypatch):
    """The fused kernel's masked fixed-trip loop must report the same
    iteration diagnostic as the XLA while-loop's trip count (the number of
    iterations entered with >=1 active patch). min_iter < max_iter so early
    stopping actually fires before max_iter."""
    h, w, psz = 40, 48, 8
    prm = DISParams(sc_f=0, sc_l=0, max_iter=16, min_iter=1, p_samp_s=psz,
                    patove=0.4, costfct=0, patnorm=1, noc=1, nop=2,
                    usetvref=False)
    spec = make_level_spec(0, w, h, prm)
    img_a, img_b = _make_pair(h, w, c=1, shift=(0.6, -0.4))
    p_init = jnp.zeros((spec.nopatches, 2), jnp.float32)
    want = _run(prm, spec, img_a, img_b, p_init, False, monkeypatch)
    got = _run(prm, spec, img_a, img_b, p_init, True, monkeypatch)
    assert 0 < int(want.iters) < prm.max_iter   # early stop must fire
    assert int(got.iters) == int(want.iters)


def test_exact_extract_mode(monkeypatch):
    """OF_DIS_TPU_EXACT_EXTRACT=1: the 3-term bf16 plane split must
    reconstruct f32 exactly, and the fused kernel must agree with the XLA
    path at a much tighter tolerance than the default hi/lo mode."""
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.random((64, 96)) * 255.0, jnp.float32)
    with monkeypatch.context() as m:
        m.setenv("OF_DIS_TPU_EXACT_EXTRACT", "1")
        terms = patch_solver._split_bf16(x)
        assert len(terms) == 3
        rec = sum(t.astype(jnp.float32) for t in terms)
        np.testing.assert_array_equal(np.asarray(rec), np.asarray(x))

        h, w, psz = 40, 48, 8
        prm = DISParams(sc_f=0, sc_l=0, max_iter=12, min_iter=12,
                        p_samp_s=psz, patove=0.4, costfct=0, patnorm=1,
                        noc=1, nop=2, usetvref=False)
        spec = make_level_spec(0, w, h, prm)
        img_a, img_b = _make_pair(h, w, c=1)
        rng = np.random.default_rng(3)
        p_init = jnp.asarray(rng.standard_normal((spec.nopatches, 2)) * 1.5,
                             jnp.float32)
        ref = _run(prm, spec, img_a, img_b, p_init, False, monkeypatch)
        got = _run(prm, spec, img_a, img_b, p_init, True, monkeypatch)
        np.testing.assert_allclose(np.asarray(got.p), np.asarray(ref.p),
                                   rtol=0, atol=2e-5)


def test_i8_plane_split_reconstructs_exactly():
    """_banded_planes_raw_i8: u8-sourced level-lv values (exact multiples
    of 4^-lv) must reconstruct bit-exactly from the hi/lo int8 planes via
    u = 256*hi + lo + 32896, u * 4^-lv."""
    rng = np.random.default_rng(5)
    for lv in (0, 2, 4):
        hp, wp = 24, 40
        u = rng.integers(0, 256 * 4 ** lv, size=(1, hp, wp))
        x = jnp.asarray(u.astype(np.float32) / float(4 ** lv))
        planes = patch_solver._banded_planes_raw_i8(x, hp + 8, lv)
        assert planes.dtype == jnp.int8
        hi, lo = (np.asarray(planes, np.int32)
                  .reshape(2, hp + 8, wp)[:, :hp])
        rec = (hi * 256 + lo + 32896).astype(np.float32) / float(4 ** lv)
        np.testing.assert_array_equal(rec, np.asarray(x[0]))


@pytest.mark.parametrize("noc", [1, 3])
def test_gn_fused_i8_extraction_bit_identical(monkeypatch, noc):
    """tgt_exact (u8-sourced target pyramid): the fused kernel's int8
    extraction dot + i32 window reconstruction must produce BIT-IDENTICAL
    results to the default bf16 hi/lo term-summed dot."""
    h, w, psz = 40, 48, 8
    prm = DISParams(sc_f=0, sc_l=0, max_iter=12, min_iter=12, p_samp_s=psz,
                    patove=0.4, costfct=0, patnorm=1, noc=noc, nop=2,
                    usetvref=False)
    spec = make_level_spec(0, w, h, prm)
    img_a, img_b = _make_pair(h, w, c=noc)
    # u8-sourced: integer pixel values (level 0 values == the bytes)
    img_a, img_b = np.round(img_a), np.round(img_b)
    im_a, dx_a, dy_a, im_b = _level_data(img_a, img_b, psz)
    tpl = patch_solver.extract_templates(spec, prm, jnp.asarray(im_a),
                                         jnp.asarray(dx_a),
                                         jnp.asarray(dy_a))
    tpl_b = patch_solver.PatchTemplates(*(f[None] for f in tpl))
    rng = np.random.default_rng(3)
    p_init = jnp.asarray(rng.standard_normal((spec.nopatches, 2)) * 1.5,
                         jnp.float32)[None]

    def run(tgt_exact):
        from jax.experimental import pallas as pl
        orig = pl.pallas_call

        def patched(*args, **kw):
            kw.setdefault("interpret", True)
            return orig(*args, **kw)

        with monkeypatch.context() as m:
            m.setattr(pl, "pallas_call", patched)
            m.setattr(patch_solver, "_use_pallas_bilerp", lambda: True)
            return patch_solver.optimize_level_batched.__wrapped__(
                spec, prm, jnp.asarray(im_b)[None], tpl_b, p_init,
                tgt_exact=tgt_exact)

    ref = run(False)
    got = run(True)
    np.testing.assert_array_equal(np.asarray(got.p), np.asarray(ref.p))
    np.testing.assert_array_equal(np.asarray(got.pt), np.asarray(ref.pt))
    np.testing.assert_array_equal(np.asarray(got.pweight),
                                  np.asarray(ref.pweight))


def test_gn_fused_pair_packed_matches_xla(monkeypatch):
    """Small-grid coarse levels can pack several pairs onto one lane axis
    (gpk > 1, opt-in via OF_DIS_TPU_PAIR_PACK) — must match the XLA path
    pair for pair."""
    monkeypatch.setenv("OF_DIS_TPU_PAIR_PACK", "1")

    h, w, psz = 24, 28, 8
    prm = DISParams(sc_f=0, sc_l=0, max_iter=12, min_iter=12, p_samp_s=psz,
                    patove=0.4, noc=1, nop=2, usetvref=False)
    spec = make_level_spec(0, w, h, prm)
    n = spec.nopatches
    assert n * 3 <= 128 < n * 4, "geometry must trigger gpk=3"
    b = 6
    rng = np.random.default_rng(11)
    ims_a, ims_b, tpls, inits = [], [], [], []
    for i in range(b):
        img_a, img_b = _make_pair(h, w, c=1, seed=20 + i)
        im_a, dx_a, dy_a, im_bt = _level_data(img_a, img_b, psz)
        tpls.append(patch_solver.extract_templates(
            spec, prm, jnp.asarray(im_a), jnp.asarray(dx_a),
            jnp.asarray(dy_a)))
        ims_b.append(jnp.asarray(im_bt))
        inits.append(jnp.asarray(
            rng.standard_normal((n, 2)) * 1.5, jnp.float32))
    im_b_b = jnp.stack(ims_b)
    tpl_b = patch_solver.PatchTemplates(
        *(jnp.stack([getattr(t, f) for t in tpls])
          for f in ("tmpl", "tdx", "tdy", "hes")))
    p_init = jnp.stack(inits)

    def run(fused):
        with monkeypatch.context() as m:
            if fused:
                from jax.experimental import pallas as pl
                orig = pl.pallas_call

                def patched(*args, **kw):
                    kw.setdefault("interpret", True)
                    return orig(*args, **kw)

                m.setattr(pl, "pallas_call", patched)
                m.setattr(patch_solver, "_use_pallas_bilerp", lambda: True)
            else:
                m.setattr(patch_solver, "_use_pallas_bilerp",
                          lambda: False)
            return patch_solver.optimize_level_batched.__wrapped__(
                spec, prm, im_b_b, tpl_b, p_init)

    ref = run(False)
    got = run(True)
    np.testing.assert_allclose(np.asarray(got.p), np.asarray(ref.p),
                               rtol=0, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got.pweight),
                               np.asarray(ref.pweight), rtol=0, atol=2e-2)
