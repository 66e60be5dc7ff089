"""TV refinement stack vs NumPy oracle, plus red-black vs raster SOR
ordering deviation bound."""

import numpy as np

import jax.numpy as jnp

from of_dis_tpu.ops import tv
from tests.oracle import oracle_tv as otv


def _data(h=20, w=24, c=1, seed=0):
    rng = np.random.default_rng(seed)
    im1 = rng.random((c, h, w)).astype(np.float32) * 255
    im2 = rng.random((c, h, w)).astype(np.float32) * 255
    wx = rng.standard_normal((h, w)).astype(np.float32) * 1.5
    wy = rng.standard_normal((h, w)).astype(np.float32) * 1.5
    return im1, im2, wx, wy


def test_warp_matches_oracle():
    im1, im2, wx, wy = _data()
    ours, mask = tv.warp_image(jnp.asarray(im2), jnp.asarray(wx), jnp.asarray(wy))
    ref, rmask = otv.warp(im2, wx, wy)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(mask), rmask)


def test_warp_mxu_matches_oracle():
    """The gather-free MXU warp (one-hot interpolation matmuls) must agree
    with the oracle to float accuracy, including border clamps, for both the
    general and the horizontal-only (depth, wy=0) variants."""
    for c in (1, 3):
        im1, im2, wx, wy = _data(c=c, seed=7)
        # include large displacements so corner clamps are exercised
        wx[0, :] = 30.0
        wy[:, 0] = -25.0
        src = jnp.asarray(im2)[None]
        coeffs = tv._warp_coeffs(jnp.asarray(wx)[None], jnp.asarray(wy)[None])
        ours, mask = tv.warp_image_mxu(src, coeffs)
        ref, rmask = otv.warp(im2, wx, wy)
        np.testing.assert_allclose(np.asarray(ours[0]), ref, atol=2e-3)
        np.testing.assert_array_equal(np.asarray(mask[0]), rmask)

        wy0 = np.zeros_like(wy)
        coeffs = tv._warp_coeffs(jnp.asarray(wx)[None], jnp.asarray(wy0)[None])
        ours_h, mask_h = tv.warp_image_mxu_h(src, coeffs)
        ref_h, rmask_h = otv.warp(im2, wx, wy0)
        np.testing.assert_allclose(np.asarray(ours_h[0]), ref_h, atol=2e-3)
        np.testing.assert_array_equal(np.asarray(mask_h[0]), rmask_h)


def test_derivatives_match_oracle():
    im1, im2, wx, wy = _data(seed=1)
    wim2, _ = otv.warp(im2, wx, wy)
    ours = tv.get_derivatives(jnp.asarray(im1), jnp.asarray(wim2))
    ref = otv.get_derivatives(im1, wim2)
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(a), b, atol=2e-3)


def test_smoothness_matches_oracle():
    _, _, wx, wy = _data(seed=2)
    qa = 2.5
    oh, ov = tv.compute_smoothness(jnp.asarray(wx), jnp.asarray(wy), qa)
    rh, rv = otv.smoothness(wx, wy, qa)
    np.testing.assert_allclose(np.asarray(oh), rh, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ov), rv, rtol=1e-5)


def test_sub_laplacian_matches_oracle():
    rng = np.random.default_rng(3)
    h, w = 12, 14
    b = rng.standard_normal((h, w)).astype(np.float32)
    src = rng.standard_normal((h, w)).astype(np.float32)
    wh = rng.random((h, w)).astype(np.float32)
    wv = rng.random((h, w)).astype(np.float32)
    wh[:, -1] = 0
    wv[-1, :] = 0
    ours = tv.sub_laplacian(jnp.asarray(b), jnp.asarray(src), jnp.asarray(wh),
                            jnp.asarray(wv))
    ref = otv.sub_laplacian(b, src, wh, wv)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_data_term_gray_matches_oracle():
    im1, im2, wx, wy = _data(seed=4)
    wim2, mask = otv.warp(im2, wx, wy)
    I = otv.get_derivatives(im1, wim2)
    rng = np.random.default_rng(5)
    du = rng.standard_normal(wx.shape).astype(np.float32) * 0.2
    dv = rng.standard_normal(wx.shape).astype(np.float32) * 0.2
    hd3, hg3 = 5.0 / 6.0, 10.0 / 6.0
    ours = tv.compute_data_gray(jnp.asarray(mask), jnp.asarray(du),
                                jnp.asarray(dv), [jnp.asarray(c) for c in I],
                                hd3, hg3)
    ref = otv.compute_data_gray(mask, du, dv, I, hd3, hg3)
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(a), b, rtol=2e-4, atol=1e-5)


def test_sor_redblack_matches_scalar_redblack():
    rng = np.random.default_rng(6)
    h, w = 10, 12
    mk = lambda: rng.standard_normal((h, w)).astype(np.float32)
    a11 = np.abs(mk()) + 3.0
    a22 = np.abs(mk()) + 3.0
    a12 = mk() * 0.1
    b1, b2 = mk(), mk()
    wh = np.abs(mk())
    wv = np.abs(mk())
    wh[:, -1] = 0
    wv[-1, :] = 0
    du0, dv0 = mk() * 0.1, mk() * 0.1
    ours = tv.sor_coupled_rb(*(jnp.asarray(x) for x in
                               (du0, dv0, a11, a12, a22, b1, b2, wh, wv)),
                             iterations=3, omega=1.6)
    # scalar red-black with identical semantics
    du_r, dv_r = du0.copy(), dv0.copy()
    for _ in range(3):
        for color in (0, 1):
            nbu = np.zeros((h, w), np.float32)
            nbv = np.zeros((h, w), np.float32)
            wsum = np.zeros((h, w), np.float32)
            for j in range(h):
                for i in range(w):
                    s = 0.0
                    for (jj, ii, wgt) in (((j - 1), i, wv[j - 1, i] if j > 0 else 0),
                                          (j, (i - 1), wh[j, i - 1] if i > 0 else 0),
                                          ((j + 1), i, wv[j, i]),
                                          (j, (i + 1), wh[j, i])):
                        if 0 <= jj < h and 0 <= ii < w and wgt:
                            nbu[j, i] += wgt * du_r[jj, ii]
                            nbv[j, i] += wgt * dv_r[jj, ii]
                        wsum[j, i] += wgt
            for j in range(h):
                for i in range(w):
                    if (i + j) % 2 != color:
                        continue
                    A11 = a11[j, i] + wsum[j, i]
                    A22 = a22[j, i] + wsum[j, i]
                    B1 = b1[j, i] + nbu[j, i]
                    B2 = b2[j, i] + nbv[j, i]
                    du_r[j, i] = (1 - 1.6) * du_r[j, i] + 1.6 / A11 * (
                        B1 - a12[j, i] * dv_r[j, i])
                    dv_r[j, i] = (1 - 1.6) * dv_r[j, i] + 1.6 / A22 * (
                        B2 - a12[j, i] * du_r[j, i])
    np.testing.assert_allclose(np.asarray(ours[0]), du_r, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours[1]), dv_r, atol=1e-4)


def test_redblack_vs_raster_small_divergence():
    """Red-black and raster orderings must agree closely after the reference's
    3 solver iterations (the parity budget argument of ops/tv.py)."""
    rng = np.random.default_rng(7)
    h, w = 16, 20
    mk = lambda: rng.standard_normal((h, w)).astype(np.float32)
    a11 = np.abs(mk()) + 5.0
    a22 = np.abs(mk()) + 5.0
    a12 = mk() * 0.1
    b1, b2 = mk(), mk()
    wh = np.abs(mk())
    wv = np.abs(mk())
    wh[:, -1] = 0
    wv[-1, :] = 0
    z = np.zeros((h, w), np.float32)
    du_rb, dv_rb = (np.asarray(x) for x in tv.sor_coupled_rb(
        *(jnp.asarray(x) for x in (z, z, a11, a12, a22, b1, b2, wh, wv)),
        iterations=3, omega=1.6))
    du_ra, dv_ra = otv.sor_raster(z, z, a11, a12, a22, b1, b2, wh, wv, 3, 1.6)
    scale = max(np.abs(du_ra).max(), np.abs(dv_ra).max())
    assert np.abs(du_rb - du_ra).max() / scale < 0.5
    # both orderings must approach the true solution comparably; compare
    # against a heavily-iterated solve
    du_t, dv_t = otv.sor_raster(z, z, a11, a12, a22, b1, b2, wh, wv, 400, 1.6)
    err_rb = np.hypot(du_rb - du_t, dv_rb - dv_t).mean()
    err_ra = np.hypot(du_ra - du_t, dv_ra - dv_t).mean()
    assert err_rb < 2.0 * err_ra + 1e-3


def test_ref_level_of_runs_and_improves_epe():
    """Full refinement level: refined flow should not be worse than the input
    on a synthetic translation."""
    import cv2
    rng = np.random.default_rng(8)
    h, w = 48, 64
    big = cv2.GaussianBlur(rng.random((h + 16, w + 16)).astype(np.float32) * 255,
                           (7, 7), 2.0)
    a = big[8:8 + h, 8:8 + w]
    m = np.float32([[1, 0, 1.0], [0, 1, 0.5]])
    b = cv2.warpAffine(big, m, (w + 16, h + 16))[8:8 + h, 8:8 + w]
    true = np.array([1.0, 0.5], np.float32)
    wx0 = np.full((h, w), 0.7, np.float32)
    wy0 = np.full((h, w), 0.3, np.float32)
    wx, wy = tv.ref_level_of(jnp.asarray(wx0), jnp.asarray(wy0),
                             jnp.asarray(a[None]), jnp.asarray(b[None]),
                             alpha=10.0, gamma=10.0, delta=5.0, n_inner=4,
                             n_solver=3, omega=1.6)
    inner = slice(8, -8)
    epe0 = np.hypot(wx0 - true[0], wy0 - true[1])[inner, inner].mean()
    epe1 = np.hypot(np.asarray(wx) - true[0],
                    np.asarray(wy) - true[1])[inner, inner].mean()
    assert epe1 < epe0


def test_warp_banded_matches_oracle():
    """The banded shifted-slab warp (large-level TPU path) must match the
    exact gather warp for in-band displacements, including clamped borders;
    the validity predicate must accept them and reject out-of-band flow."""
    for c, seed in ((1, 0), (3, 1)):
        im1, im2, wx, wy = _data(c=c, seed=seed)
        # push some displacements near the band edge and over the borders
        wx = wx * 2.0
        wy = wy * 2.0
        src = jnp.asarray(im2)[None]
        bwx, bwy = jnp.asarray(wx)[None], jnp.asarray(wy)[None]
        assert bool(tv._banded_warp_valid(bwx, bwy, tv._BANDED_WARP_R))
        ours = tv.warp_image_banded(src, bwx, bwy, tv._BANDED_WARP_R)
        ref, _ = otv.warp(im2, wx, wy)
        np.testing.assert_allclose(np.asarray(ours)[0], ref, atol=1e-3)

    # horizontal-only (depth) variant
    im1, im2, wx, wy = _data()
    ours_h = tv.warp_image_banded(jnp.asarray(im2)[None],
                                  jnp.asarray(wx)[None],
                                  jnp.zeros_like(jnp.asarray(wy))[None],
                                  tv._BANDED_WARP_R, horiz_only=True)
    ref_h, _ = otv.warp(im2, wx, np.zeros_like(wy))
    np.testing.assert_allclose(np.asarray(ours_h)[0], ref_h, atol=1e-3)

    # out-of-band flow must be rejected (the model then takes the gather
    # fallback branch)
    big = jnp.full_like(bwx, float(tv._BANDED_WARP_R + 3))
    assert not bool(tv._banded_warp_valid(big, bwy, tv._BANDED_WARP_R))


def test_warp_banded_radius_cascade(monkeypatch):
    """warp_image_batched's runtime radius cascade: subpixel flows take the
    tight r=4 band, mid-range flows the r=16 band, wild flows the gather —
    every branch must agree with the exact oracle warp."""
    # small test images would route to the MXU warp; force the cascade
    monkeypatch.setenv("OF_DIS_TPU_NO_MXU_WARP", "1")
    # the r=4 branch is now a Pallas kernel — interpret it on CPU
    from jax.experimental import pallas as pl
    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call",
        lambda *a, **kw: orig(*a, **{"interpret": True, **kw}))
    im1, im2, wx, wy = _data()
    src = jnp.asarray(im2)[None]
    h, w = wx.shape
    cases = [
        (0.4, "r4"),                              # |floor| <= 1
        (float(tv._BANDED_WARP_R_SMALL + 2), "r16"),
        (float(tv._BANDED_WARP_R + 4), "gather"),
    ]
    for mag, name in cases:
        fx = np.clip(wx, -0.9, 0.9) + mag
        fy = np.clip(wy, -0.9, 0.9)
        bwx, bwy = jnp.asarray(fx)[None], jnp.asarray(fy)[None]
        small_ok = bool(tv._banded_warp_valid(bwx, bwy,
                                              tv._BANDED_WARP_R_SMALL))
        big_ok = bool(tv._banded_warp_valid(bwx, bwy, tv._BANDED_WARP_R))
        assert small_ok == (name == "r4"), name
        assert big_ok == (name != "gather"), name
        out, _ = tv.warp_image_batched(src, bwx, bwy, use_pallas=True, bb=1)
        ref, _ = otv.warp(im2, fx, fy)
        # the gather branch quantizes to 16-bit packed pairs
        atol = 1e-3 if name != "gather" else 0.1
        np.testing.assert_allclose(np.asarray(out)[0], ref, atol=atol)
