"""The tiled windowed GN kernel must match the pure-XLA while-loop path.

The tiled kernel (patch_solver._gn_tiled_pallas) serves the large op-3/4
fine levels: per-(pair, 2-D patch tile) VMEM plane windows instead of
whole-plane one-hot dots. On CPU it runs in Pallas interpret mode; the
real-TPU Mosaic lowering is covered by tools/smoke_tpu.py and the bench.

Also covers the runtime fallback: a coarser flow whose spread exceeds the
static window must take the lax.cond XLA branch and still be exact.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from of_dis_tpu.ops import patch_solver
from of_dis_tpu.params import DISParams, make_level_spec
from tests.test_patch_solver import _level_data, _make_pair

H, W = 60, 120   # steps=4 at psz=8/patove=0.4 -> 30x15 grid, ragged tiles


def _run(prm, spec, im_b, tpl, p_init, mode, monkeypatch):
    """mode: 'tiled' (force the tiled kernel, interpret), 'xla'."""
    tpl_b = patch_solver.PatchTemplates(*(f[None] for f in tpl))
    with monkeypatch.context() as m:
        if mode == "tiled":
            from jax.experimental import pallas as pl
            orig = pl.pallas_call

            def patched(*args, **kw):
                kw.setdefault("interpret", True)
                return orig(*args, **kw)

            m.setattr(pl, "pallas_call", patched)
            m.setattr(patch_solver, "_use_pallas_bilerp", lambda: True)
            # force the big-level branch on this small test level
            m.setattr(patch_solver, "_pick_gn_bb", lambda *a, **k: None)
            assert patch_solver._pick_tile_geom(spec, prm) is not None
        else:
            m.setattr(patch_solver, "_use_pallas_bilerp", lambda: False)
        res = patch_solver.optimize_level_batched.__wrapped__(
            spec, prm, jnp.asarray(im_b)[None], tpl_b, p_init[None])
    return res


def _setup(noc=1, nop=2, costfct=0, patnorm=1, seed=0):
    psz = 8
    prm = DISParams(sc_f=0, sc_l=0, max_iter=8, min_iter=8, p_samp_s=psz,
                    patove=0.4, costfct=costfct, patnorm=patnorm, noc=noc,
                    nop=nop, usetvref=False)
    spec = make_level_spec(0, W, H, prm)
    img_a, img_b = _make_pair(H, W, c=noc, seed=seed)
    im_a, dx_a, dy_a, im_b = _level_data(img_a, img_b, psz)
    tpl = patch_solver.extract_templates(spec, prm, jnp.asarray(im_a),
                                         jnp.asarray(dx_a),
                                         jnp.asarray(dy_a))
    return prm, spec, im_b, tpl


@pytest.mark.parametrize("noc,nop,costfct,patnorm",
                         [(1, 2, 0, 1), (1, 2, 1, 1), (1, 1, 0, 1),
                          (1, 2, 2, 0), (3, 2, 0, 1), (3, 1, 0, 1)])
@pytest.mark.parametrize("force_single", [False, True])
def test_tiled_matches_xla(monkeypatch, noc, nop, costfct, patnorm,
                           force_single):
    if force_single and (noc, nop, costfct, patnorm) not in (
            (1, 2, 0, 1), (1, 1, 0, 1)):
        pytest.skip("single-stage fallback covered on the two main modes")
    if force_single:
        monkeypatch.setenv("OF_DIS_TPU_TILE_SINGLE_STAGE", "1")
    prm, spec, im_b, tpl = _setup(noc, nop, costfct, patnorm)
    geom = patch_solver._pick_tile_geom(spec, prm)
    assert geom is not None
    # default picks the two-stage (x-dot + band-select) formulation — the
    # wide nb=256 tiles and all RGB windows only fit without the banded
    # lhs; OF_DIS_TPU_TILE_SINGLE_STAGE=1 exercises the banded-lhs form
    # (noc=3 still routes two-stage: the banded lhs fits no RGB window)
    assert geom.two_stage == ((not force_single) or noc == 3)
    n = spec.nopatches
    rng = np.random.default_rng(1)
    # smooth-ish init flow with moderate values (windows must fit)
    p_init = jnp.asarray(rng.normal(0, 1.5, (n, nop)).astype(np.float32))
    want = _run(prm, spec, im_b, tpl, p_init, "xla", monkeypatch)
    got = _run(prm, spec, im_b, tpl, p_init, "tiled", monkeypatch)
    np.testing.assert_allclose(np.asarray(got.p), np.asarray(want.p),
                               rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got.pweight),
                               np.asarray(want.pweight),
                               rtol=1e-3, atol=5e-2)


def test_tiled_fallback_on_wild_flow(monkeypatch):
    """Per-tile window validity: a huge-spread init flow exceeds any static
    window on more than k_max tiles, so the chunked exact recompute loops
    over MULTIPLE fix-up chunks (the while_loop that replaced the
    whole-level-fallback lax.cond) and must reproduce the exact XLA path
    (with OF_DIS_TPU_LEVEL_FALLBACK=1 the legacy cond route is kept and
    covered by test_tiled_fixup_disabled_env's k_max==0 path)."""
    prm, spec, im_b, tpl = _setup()
    n = spec.nopatches
    rng = np.random.default_rng(2)
    p_init = jnp.asarray(rng.uniform(-60, 60, (n, 2)).astype(np.float32))
    want = _run(prm, spec, im_b, tpl, p_init, "xla", monkeypatch)
    got = _run(prm, spec, im_b, tpl, p_init, "tiled", monkeypatch)
    # tiles that stay on the kernel differ from the XLA path by
    # reduction-order ulps compounded through the GN loop (the cm (i, j)
    # element order sums in a different order — see _gn_tiled_pallas
    # docstring, measured |dp| <= ~1e-4); fixed-up tiles are bit-exact
    np.testing.assert_allclose(np.asarray(got.p), np.asarray(want.p),
                               rtol=2e-4, atol=2e-4)


def test_tiled_legacy_level_fallback_env(monkeypatch):
    """OF_DIS_TPU_LEVEL_FALLBACK=1 restores the round-3 structure (bounded
    single-chunk fix-up + whole-level-fallback lax.cond) — wild flow must
    still match the exact XLA path through the cond route."""
    monkeypatch.setenv("OF_DIS_TPU_LEVEL_FALLBACK", "1")
    prm, spec, im_b, tpl = _setup()
    n = spec.nopatches
    rng = np.random.default_rng(7)
    p_init = jnp.asarray(rng.uniform(-60, 60, (n, 2)).astype(np.float32))
    want = _run(prm, spec, im_b, tpl, p_init, "xla", monkeypatch)
    got = _run(prm, spec, im_b, tpl, p_init, "tiled", monkeypatch)
    np.testing.assert_allclose(np.asarray(got.p), np.asarray(want.p),
                               rtol=1e-5, atol=1e-5)


def test_tiled_single_bad_tile_fixup(monkeypatch):
    """A motion-boundary-style init flow (one tile with a wild internal
    spread, everything else smooth) must take the bounded per-tile
    recompute — NOT the whole-level fallback — and still match the exact
    XLA path everywhere, including inside the recomputed tile."""
    # a tall plane: the small default test level's clipped window covers
    # its whole reachable range, so no in-plane spread can invalidate a
    # tile there
    h2, w2 = 160, 200
    psz = 8
    prm = DISParams(sc_f=0, sc_l=0, max_iter=8, min_iter=8, p_samp_s=psz,
                    patove=0.4, costfct=0, patnorm=1, noc=1, nop=2,
                    usetvref=False)
    spec = make_level_spec(0, w2, h2, prm)
    img_a, img_b = _make_pair(h2, w2, seed=3)
    im_a, dx_a, dy_a, im_b = _level_data(img_a, img_b, psz)
    tpl = patch_solver.extract_templates(spec, prm, jnp.asarray(im_a),
                                         jnp.asarray(dx_a),
                                         jnp.asarray(dy_a))
    geom = patch_solver._pick_tile_geom(spec, prm)
    n = spec.nopatches
    rng = np.random.default_rng(3)
    p_init = rng.normal(0, 1.0, (n, 2)).astype(np.float32)
    # poison one mid-grid tile with an in-plane y-spread far beyond the
    # window band (positions stay inside bounds: not init-OOB)
    perm, _, t_tiles = patch_solver._tile_perm(spec, geom)
    tile1 = perm[geom.nb:2 * geom.nb]
    tile1 = tile1[tile1 >= 0]
    ptr_np = np.asarray(patch_solver.grid_ref_points(spec))
    lo, hi = float(spec.tmp_lb) + 1.0, float(spec.tmp_ubh) - 1.0
    p_init[tile1[0], 1] = hi - ptr_np[tile1[0], 1]
    p_init[tile1[-1], 1] = lo - ptr_np[tile1[-1], 1]
    p_init = jnp.asarray(p_init)
    ptr = patch_solver.grid_ref_points(spec).T[None]
    *_, ok = patch_solver._tile_windows(
        spec, prm, geom, jnp.swapaxes(p_init, 0, 1)[None], ptr, 1)
    okm = np.asarray(ok).reshape(-1)
    assert not okm[1]                      # the poisoned tile is invalid
    assert okm.sum() == okm.size - 1       # every other tile is fine
    want = _run(prm, spec, im_b, tpl, p_init, "xla", monkeypatch)
    got = _run(prm, spec, im_b, tpl, p_init, "tiled", monkeypatch)
    np.testing.assert_allclose(np.asarray(got.p), np.asarray(want.p),
                               rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got.pweight),
                               np.asarray(want.pweight),
                               rtol=1e-3, atol=5e-2)


def test_tiled_slot0_bad_pad_collision(monkeypatch):
    """Poison flat slot 0 (pair 0, FIRST tile in tiled order) with the
    default k_max, so nbad < k_max and the chunk's pad slots (nonzero
    fill_value=0) all point at the same (pair 0, tile 0) the real slot
    fixes. slot_bad must be validity-based (~flat_ok[slot]) so every
    duplicate of that index carries the identical recomputed value —
    a position-based mask would make the pads write the tiled kernel's
    garbage output and the undefined duplicate-scatter order could
    drop the fix."""
    h2, w2 = 160, 200
    psz = 8
    prm = DISParams(sc_f=0, sc_l=0, max_iter=8, min_iter=8, p_samp_s=psz,
                    patove=0.4, costfct=0, patnorm=1, noc=1, nop=2,
                    usetvref=False)
    spec = make_level_spec(0, w2, h2, prm)
    img_a, img_b = _make_pair(h2, w2, seed=5)
    im_a, dx_a, dy_a, im_b = _level_data(img_a, img_b, psz)
    tpl = patch_solver.extract_templates(spec, prm, jnp.asarray(im_a),
                                         jnp.asarray(dx_a),
                                         jnp.asarray(dy_a))
    geom = patch_solver._pick_tile_geom(spec, prm)
    n = spec.nopatches
    rng = np.random.default_rng(5)
    p_init = rng.normal(0, 1.0, (n, 2)).astype(np.float32)
    perm, _, t_tiles = patch_solver._tile_perm(spec, geom)
    tile0 = perm[:geom.nb]
    tile0 = tile0[tile0 >= 0]
    ptr_np = np.asarray(patch_solver.grid_ref_points(spec))
    lo, hi = float(spec.tmp_lb) + 1.0, float(spec.tmp_ubh) - 1.0
    p_init[tile0[0], 1] = hi - ptr_np[tile0[0], 1]
    p_init[tile0[-1], 1] = lo - ptr_np[tile0[-1], 1]
    p_init = jnp.asarray(p_init)
    ptr = patch_solver.grid_ref_points(spec).T[None]
    *_, ok = patch_solver._tile_windows(
        spec, prm, geom, jnp.swapaxes(p_init, 0, 1)[None], ptr, 1)
    okm = np.asarray(ok).reshape(-1)
    assert not okm[0]                      # flat slot 0 itself is invalid
    nbad = int((~okm).sum())
    k_max = min(16, max(4, 2 * 1))         # the default k_max at b=1
    assert nbad < k_max                    # => pad slots exist in the chunk
    want = _run(prm, spec, im_b, tpl, p_init, "xla", monkeypatch)
    got = _run(prm, spec, im_b, tpl, p_init, "tiled", monkeypatch)
    np.testing.assert_allclose(np.asarray(got.p), np.asarray(want.p),
                               rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got.pweight),
                               np.asarray(want.pweight),
                               rtol=1e-3, atol=5e-2)


def test_tiled_multichunk_fixup(monkeypatch):
    """The chunked recompute must iterate MULTIPLE while_loop chunks and
    still match the exact XLA path: poison several tiles and cap the chunk
    size at one slot (OF_DIS_TPU_TILE_FIXUP_MAX=1 -> nbad chunks). Also
    covers the last-chunk boundary when the slot table rounds up."""
    monkeypatch.setenv("OF_DIS_TPU_TILE_FIXUP_MAX", "1")
    h2, w2 = 160, 200
    psz = 8
    prm = DISParams(sc_f=0, sc_l=0, max_iter=8, min_iter=8, p_samp_s=psz,
                    patove=0.4, costfct=0, patnorm=1, noc=1, nop=2,
                    usetvref=False)
    spec = make_level_spec(0, w2, h2, prm)
    img_a, img_b = _make_pair(h2, w2, seed=9)
    im_a, dx_a, dy_a, im_b = _level_data(img_a, img_b, psz)
    tpl = patch_solver.extract_templates(spec, prm, jnp.asarray(im_a),
                                         jnp.asarray(dx_a),
                                         jnp.asarray(dy_a))
    geom = patch_solver._pick_tile_geom(spec, prm)
    n = spec.nopatches
    rng = np.random.default_rng(9)
    p_init = rng.normal(0, 1.0, (n, 2)).astype(np.float32)
    perm, _, t_tiles = patch_solver._tile_perm(spec, geom)
    assert t_tiles >= 3
    ptr_np = np.asarray(patch_solver.grid_ref_points(spec))
    lo, hi = float(spec.tmp_lb) + 1.0, float(spec.tmp_ubh) - 1.0
    for ti in range(3):                    # poison three distinct tiles
        tk = perm[ti * geom.nb:(ti + 1) * geom.nb]
        tk = tk[tk >= 0]
        p_init[tk[0], 1] = hi - ptr_np[tk[0], 1]
        p_init[tk[-1], 1] = lo - ptr_np[tk[-1], 1]
    p_init = jnp.asarray(p_init)
    ptr = patch_solver.grid_ref_points(spec).T[None]
    *_, ok = patch_solver._tile_windows(
        spec, prm, geom, jnp.swapaxes(p_init, 0, 1)[None], ptr, 1)
    assert int((~np.asarray(ok)).sum()) >= 3   # >= 3 one-slot chunks
    want = _run(prm, spec, im_b, tpl, p_init, "xla", monkeypatch)
    got = _run(prm, spec, im_b, tpl, p_init, "tiled", monkeypatch)
    np.testing.assert_allclose(np.asarray(got.p), np.asarray(want.p),
                               rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got.pweight),
                               np.asarray(want.pweight),
                               rtol=1e-3, atol=5e-2)


def test_tiled_init_oob_patches(monkeypatch):
    """Init-OOB patches inside the tiled kernel keep p = p_init and the
    documented template pweight; in-bounds patches are unaffected."""
    prm, spec, im_b, tpl = _setup()
    n = spec.nopatches
    p_init = np.zeros((n, 2), np.float32)
    p_init[0] = (1e4, 1e4)       # far out of bounds
    want = _run(prm, spec, im_b, tpl, jnp.asarray(p_init), "xla",
                monkeypatch)
    got = _run(prm, spec, im_b, tpl, jnp.asarray(p_init), "tiled",
               monkeypatch)
    np.testing.assert_allclose(np.asarray(got.p), np.asarray(want.p),
                               rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got.pweight[0, ..., 0]),
                               np.asarray(want.pweight[0, ..., 0]),
                               rtol=1e-5, atol=1e-5)


def test_tiled_fixup_disabled_env(monkeypatch):
    """OF_DIS_TPU_TILE_FIXUP_MAX=0 restores whole-level-fallback behavior:
    with any bad tile the exact XLA path must produce the result (and the
    k_max==0 structural path must trace)."""
    monkeypatch.setenv("OF_DIS_TPU_TILE_FIXUP_MAX", "0")
    prm, spec, im_b, tpl = _setup()
    n = spec.nopatches
    rng = np.random.default_rng(5)
    p_init = jnp.asarray(rng.uniform(-60, 60, (n, 2)).astype(np.float32))
    want = _run(prm, spec, im_b, tpl, p_init, "xla", monkeypatch)
    got = _run(prm, spec, im_b, tpl, p_init, "tiled", monkeypatch)
    np.testing.assert_allclose(np.asarray(got.p), np.asarray(want.p),
                               rtol=1e-5, atol=1e-5)


def test_mxu_warp_budget_routing():
    """The per-pair MXU-warp budget routes op-2-sized levels to the MXU
    one-hot path and op-3 fine levels to the banded cascade, independent
    of batch size."""
    from of_dis_tpu.ops import tv
    # op-2 finest level (128x56): ~5 MB/pair -> MXU at any batch
    assert tv._use_mxu_warp(1, 1, 56, 128, False)
    assert tv._use_mxu_warp(64, 1, 56, 128, False)
    # op-3 L2 (256x112): ~42 MB/pair -> banded
    assert not tv._use_mxu_warp(1, 1, 112, 256, False)
    # op-3 L1 (512x224): way over -> banded
    assert not tv._use_mxu_warp(8, 1, 224, 512, False)
    # horizontal-only (depth) drops the Z term: budget covers more
    assert tv._use_mxu_warp(1, 1, 112, 256, True)


def test_mxu_warp_legacy_gb_knob(monkeypatch):
    """The pre-round-3 OF_DIS_TPU_MXU_WARP_GB knob keeps its original
    absolute-over-batch semantics when set."""
    from of_dis_tpu.ops import tv
    monkeypatch.setenv("OF_DIS_TPU_MXU_WARP_GB", "3")
    # op-3 L1 at batch 8: 8*(a+z) ~ 2.7 GB < 3 GB -> legacy keeps MXU
    assert tv._use_mxu_warp(8, 1, 224, 512, False)
    # but over the absolute budget at batch 16
    assert not tv._use_mxu_warp(16, 1, 224, 512, False)


def test_fast_path_geometry_coverage():
    """Every production mode x op-point fine level must get a tiled
    geometry (None would silently run the slow nb-blocked/XLA path — the
    regression a VMEM-estimate change almost shipped: the RGB windows are
    within ~1 MB of the cap). INT/DE must get the wide nb=256 tiles."""
    from of_dis_tpu.params import op_point_params
    cases = [(3, 1, 2, 256), (3, 3, 2, 128), (3, 1, 1, 256),
             (4, 1, 2, 256), (4, 3, 2, 128), (4, 1, 1, 256)]
    for op, noc, nop, want_nb in cases:
        prm = op_point_params(1024, op, nop=nop, noc=noc)
        for sl in (1, 2) if op == 3 else (0, 1):
            spec = make_level_spec(sl, 1024, 448, prm, camlr=0)
            geom = patch_solver._pick_tile_geom(spec, prm)
            assert geom is not None, (op, noc, nop, sl)
            assert geom.nb >= want_nb, (op, noc, nop, sl, geom)
            assert geom.two_stage, (op, noc, nop, sl, geom)


def test_window_validity_smooth_flow_op3_geometry():
    """A smooth, small-magnitude coarser flow must produce valid windows at
    the real op-3 level geometries (valid=False would silently run the slow
    fallback on every frame — the bug that shipped 18 pairs/s)."""
    from of_dis_tpu.params import op_point_params
    prm = op_point_params(1024, 3, nop=2, noc=1)
    for sl in (3, 2, 1):
        spec = make_level_spec(sl, 1024, 448, prm, camlr=0)
        geom = patch_solver._pick_tile_geom(spec, prm)
        assert geom is not None, sl
        n = spec.nopatches
        rng = np.random.default_rng(0)
        p_init = np.stack([np.full(n, 3.0 / 2 ** sl),
                           np.full(n, 2.0 / 2 ** sl)], 1).astype(np.float32)
        p_init += rng.normal(0, 0.5, (n, 2)).astype(np.float32)
        ptr = patch_solver.grid_ref_points(spec).T[None]
        *_, ok = patch_solver._tile_windows(
            spec, prm, geom, jnp.swapaxes(jnp.asarray(p_init), 0, 1)[None],
            ptr, 1)
        assert bool(jnp.all(ok)), sl


def test_tiled_depth_right_camera(monkeypatch):
    """The tiled kernel under the camlr=1 (right camera) spec — the
    backward grid of the depth fbcon pairing — must clamp the disparity
    sign the other way and match the XLA path."""
    psz = 8
    prm = DISParams(sc_f=0, sc_l=0, max_iter=8, min_iter=8, p_samp_s=psz,
                    patove=0.4, costfct=0, patnorm=1, noc=1, nop=1,
                    usetvref=False)
    spec = make_level_spec(0, W, H, prm, camlr=1)
    # fractional shift well below outlierthresh (= psz/2): integer shifts
    # park positions exactly on ceil cell boundaries where extraction
    # float noise flips cells; boundary/threshold patches take chaotic
    # paths either way
    img_a, img_b = _make_pair(H, W, shift=(2.3, 0.0))
    from tests.test_patch_solver import _level_data as _ld
    im_a, dx_a, dy_a, im_b = _ld(img_a, img_b, psz)
    tpl = patch_solver.extract_templates(spec, prm, jnp.asarray(im_a),
                                         jnp.asarray(dx_a),
                                         jnp.asarray(dy_a))
    n = spec.nopatches
    p_init = jnp.zeros((n, 1), jnp.float32)
    want = _run(prm, spec, im_b, tpl, p_init, "xla", monkeypatch)
    got = _run(prm, spec, im_b, tpl, p_init, "tiled", monkeypatch)
    np.testing.assert_allclose(np.asarray(got.p), np.asarray(want.p),
                               rtol=1e-4, atol=2e-3)
    # right camera: disparities clamped nonnegative
    assert np.all(np.asarray(got.p) >= 0.0)


def test_tiled_iters_matches_xla(monkeypatch):
    """The tiled kernel's iteration diagnostic (max over tiles of the
    active-iteration count) must equal the XLA while-loop trip count."""
    psz = 8
    prm = DISParams(sc_f=0, sc_l=0, max_iter=16, min_iter=1, p_samp_s=psz,
                    patove=0.4, costfct=0, patnorm=1, noc=1, nop=2,
                    usetvref=False)
    spec = make_level_spec(0, W, H, prm)
    img_a, img_b = _make_pair(H, W, c=1, seed=4, shift=(0.6, -0.4))
    im_a, dx_a, dy_a, im_b = _level_data(img_a, img_b, psz)
    tpl = patch_solver.extract_templates(spec, prm, jnp.asarray(im_a),
                                         jnp.asarray(dx_a),
                                         jnp.asarray(dy_a))
    p_init = jnp.zeros((spec.nopatches, 2), jnp.float32)
    want = _run(prm, spec, im_b, tpl, p_init, "xla", monkeypatch)
    got = _run(prm, spec, im_b, tpl, p_init, "tiled", monkeypatch)
    assert 0 < int(want.iters) < prm.max_iter
    assert int(got.iters) == int(want.iters)


# ---------------------------------------------------------------------------
# In-kernel template extraction (geom.ybs > 0): the tiled kernel extracts
# templates/gradients/Hessian from a static source window instead of
# reading (B, D, N) HBM template arrays. For u8-valued images the bf16
# hi/lo planes reconstruct exactly, so extracted values are bit-identical
# to extract_templates'; the in-kernel mean/Hessian/projection reductions
# may differ by ordering ulps (tolerances below account for the drift
# through a full GN run).

def _setup_u8(noc=1, nop=2, patnorm=1, seed=0, h=H, w=W):
    psz = 8
    prm = DISParams(sc_f=0, sc_l=0, max_iter=8, min_iter=8, p_samp_s=psz,
                    patove=0.4, costfct=0, patnorm=patnorm, noc=noc,
                    nop=nop, usetvref=False)
    spec = make_level_spec(0, w, h, prm)
    img_a, img_b = _make_pair(h, w, c=noc, seed=seed)
    img_a = np.round(np.clip(img_a, 0, 255)).astype(np.float32)
    img_b = np.round(np.clip(img_b, 0, 255)).astype(np.float32)
    im_a, dx_a, dy_a, im_b = _level_data(img_a, img_b, psz)
    src = (jnp.asarray(im_a)[None], jnp.asarray(dx_a)[None],
           jnp.asarray(dy_a)[None])
    tpl = patch_solver.extract_templates(spec, prm, jnp.asarray(im_a),
                                         jnp.asarray(dx_a),
                                         jnp.asarray(dy_a))
    return prm, spec, im_b, tpl, src


def _run_ik(prm, spec, im_b, src, p_init, monkeypatch):
    """Run optimize_level_batched on the in-kernel-template tiled path
    (interpret mode)."""
    from jax.experimental import pallas as pl
    with monkeypatch.context() as m:
        orig = pl.pallas_call

        def patched(*args, **kw):
            kw.setdefault("interpret", True)
            return orig(*args, **kw)

        m.setattr(pl, "pallas_call", patched)
        m.setattr(patch_solver, "_use_pallas_bilerp", lambda: True)
        m.setattr(patch_solver, "_pick_gn_bb", lambda *a, **k: None)
        geom = patch_solver._pick_tile_geom(spec, prm, inkernel=True)
        assert geom is not None and geom.ybs > 0
        return patch_solver.optimize_level_batched.__wrapped__(
            spec, prm, jnp.asarray(im_b)[None], None, p_init[None],
            src=src, src_exact=True)


@pytest.mark.parametrize("noc,nop,patnorm",
                         [(1, 2, 1), (1, 1, 1), (3, 2, 1), (1, 2, 0)])
def test_inkernel_templates_match_xla(monkeypatch, noc, nop, patnorm):
    prm, spec, im_b, tpl, src = _setup_u8(noc, nop, patnorm)
    n = spec.nopatches
    rng = np.random.default_rng(1)
    p_init = jnp.asarray(rng.normal(0, 1.5, (n, nop)).astype(np.float32))
    want = _run(prm, spec, im_b, tpl, p_init, "xla", monkeypatch)
    got = _run_ik(prm, spec, im_b, src, p_init, monkeypatch)
    np.testing.assert_allclose(np.asarray(got.p), np.asarray(want.p),
                               rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got.pweight),
                               np.asarray(want.pweight),
                               rtol=1e-3, atol=5e-2)


def test_inkernel_fixup_poisoned_tile(monkeypatch):
    """With in-kernel templates, a bad tile's bounded exact recompute must
    build the template gathers lazily from the source fields and still
    match the XLA path everywhere."""
    h2, w2 = 160, 200
    prm, spec, im_b, tpl, src = _setup_u8(h=h2, w=w2, seed=3)
    geom = patch_solver._pick_tile_geom(spec, prm, inkernel=True)
    assert geom is not None and geom.ybs > 0
    n = spec.nopatches
    rng = np.random.default_rng(3)
    p_init = rng.normal(0, 1.0, (n, 2)).astype(np.float32)
    perm, _, t_tiles = patch_solver._tile_perm(spec, geom)
    tile1 = perm[geom.nb:2 * geom.nb]
    tile1 = tile1[tile1 >= 0]
    ptr_np = np.asarray(patch_solver.grid_ref_points(spec))
    lo, hi = float(spec.tmp_lb) + 1.0, float(spec.tmp_ubh) - 1.0
    p_init[tile1[0], 1] = hi - ptr_np[tile1[0], 1]
    p_init[tile1[-1], 1] = lo - ptr_np[tile1[-1], 1]
    p_init = jnp.asarray(p_init)
    ptr = patch_solver.grid_ref_points(spec).T[None]
    *_, ok = patch_solver._tile_windows(
        spec, prm, geom, jnp.swapaxes(p_init, 0, 1)[None], ptr, 1)
    okm = np.asarray(ok).reshape(-1)
    assert not okm.all() and okm.sum() >= okm.size - 2
    want = _run(prm, spec, im_b, tpl, p_init, "xla", monkeypatch)
    got = _run_ik(prm, spec, im_b, src, p_init, monkeypatch)
    np.testing.assert_allclose(np.asarray(got.p), np.asarray(want.p),
                               rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got.pweight),
                               np.asarray(want.pweight),
                               rtol=1e-3, atol=5e-2)


def test_inkernel_src_with_knob_disabled(monkeypatch):
    """OF_DIS_TPU_NO_INKERNEL_TPL=1 with src-only input must fall back to
    materialized templates (ensure_tpl) on the plain tiled path and match
    the XLA result."""
    monkeypatch.setenv("OF_DIS_TPU_NO_INKERNEL_TPL", "1")
    prm, spec, im_b, tpl, src = _setup_u8()
    n = spec.nopatches
    rng = np.random.default_rng(5)
    p_init = jnp.asarray(rng.normal(0, 1.5, (n, 2)).astype(np.float32))
    want = _run(prm, spec, im_b, tpl, p_init, "xla", monkeypatch)
    got = _run_ik(prm, spec, im_b, src, p_init, monkeypatch)
    np.testing.assert_allclose(np.asarray(got.p), np.asarray(want.p),
                               rtol=1e-4, atol=2e-3)


def test_inkernel_geometry_coverage():
    """Every production mode x op-point fine level must get an in-kernel
    template geometry (ybs > 0) — a 0 would silently reinstate the
    template build + tiled-order relayout (~25% of op-3 batch time)."""
    from of_dis_tpu.params import op_point_params
    cases = [(3, 1, 2), (3, 3, 2), (3, 1, 1), (4, 1, 2), (4, 3, 2),
             (4, 1, 1)]
    for op, noc, nop in cases:
        prm = op_point_params(1024, op, nop=nop, noc=noc)
        for sl in (1, 2) if op == 3 else (0, 1):
            spec = make_level_spec(sl, 1024, 448, prm, camlr=0)
            geom = patch_solver._pick_tile_geom(spec, prm, inkernel=True)
            assert geom is not None, (op, noc, nop, sl)
            assert geom.ybs > 0 and geom.xbs > 0, (op, noc, nop, sl, geom)
