"""The fused Pallas TV kernel must match the pure-XLA inner loop.

On CPU the kernel runs in Pallas interpret mode; on TPU it compiles via
Mosaic (covered by the TPU bench/driver runs).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from of_dis_tpu.ops import tv


def _data(h=24, w=32, c=1, seed=0):
    rng = np.random.default_rng(seed)
    im1 = jnp.asarray(rng.random((c, h, w)), jnp.float32) * 255
    im2 = jnp.asarray(rng.random((c, h, w)), jnp.float32) * 255
    wx = jnp.asarray(rng.standard_normal((h, w)), jnp.float32)
    wy = jnp.asarray(rng.standard_normal((h, w)), jnp.float32)
    return im1, im2, wx, wy


def _interp_pallas(monkeypatch):
    """Force the Pallas path, in interpret mode (we're on CPU in tests)."""
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def patched(*args, **kw):
        kw.setdefault("interpret", True)
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", patched)
    monkeypatch.setattr(tv, "_use_pallas", lambda h, w, noc: True)


@pytest.mark.parametrize("noc", [1, 3])
def test_of_pallas_matches_pure(monkeypatch, noc):
    im1, im2, wx, wy = _data(c=noc)
    kw = dict(alpha=10.0, gamma=10.0, delta=5.0, n_inner=3, n_solver=3,
              omega=1.6)
    uu0, vv0 = tv.ref_level_of(wx, wy, im1, im2, **kw)
    _interp_pallas(monkeypatch)
    uu1, vv1 = tv.ref_level_of(wx, wy, im1, im2, **kw)
    np.testing.assert_allclose(np.asarray(uu1), np.asarray(uu0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(vv1), np.asarray(vv0), atol=1e-4)


@pytest.mark.parametrize("camlr", [0, 1])
def test_de_pallas_matches_pure(monkeypatch, camlr):
    im1, im2, wx, _ = _data(seed=3)
    wx = -jnp.abs(wx) if camlr == 0 else jnp.abs(wx)
    kw = dict(alpha=10.0, gamma=10.0, delta=5.0, n_inner=2, n_solver=3,
              omega=1.6)
    d0 = tv.ref_level_de(wx, im1, im2, camlr=camlr, **kw)
    _interp_pallas(monkeypatch)
    d1 = tv.ref_level_de(wx, im1, im2, camlr=camlr, **kw)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), atol=1e-4)


def _warp_data(b=2, c=1, h=28, w=40, seed=1, scale=1.5):
    """Flows clipped inside the r=4 band (banded == gather only in-band)."""
    rng = np.random.default_rng(seed)
    src = jnp.asarray(rng.random((b, c, h, w)), jnp.float32) * 255
    wx = jnp.asarray(np.clip(rng.standard_normal((b, h, w)) * scale,
                             -2.5, 2.4), jnp.float32)
    wy = jnp.asarray(np.clip(rng.standard_normal((b, h, w)) * scale,
                             -2.5, 2.4), jnp.float32)
    return src, wx, wy


@pytest.mark.parametrize("c", [1, 3])
def test_banded_pallas_warp_matches_gather(monkeypatch, c):
    """The fused banded-warp kernel must match the exact gather warp for
    in-band displacements (and its mask must match the coeffs mask)."""
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def patched(*args, **kw):
        kw.setdefault("interpret", True)
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", patched)
    src, wx, wy = _warp_data(c=c)
    ref, mask_ref = tv.warp_image_batched(src, wx, wy, use_pallas=False,
                                          bb=1)
    out, mask = tv.warp_image_banded_pallas(src, wx, wy, r=4, bb=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(mask_ref))
    # bit-identical to the XLA banded form (same op order)
    xla = tv.warp_image_banded(src, wx, wy, r=4)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(xla))


def test_banded_pallas_warp_horiz_only(monkeypatch):
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def patched(*args, **kw):
        kw.setdefault("interpret", True)
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", patched)
    src, wx, _ = _warp_data(seed=5)
    wy = jnp.zeros_like(wx)
    ref, _ = tv.warp_image_batched(src, wx, wy, use_pallas=False, bb=1)
    out, _ = tv.warp_image_banded_pallas(src, wx, wy, r=4, bb=2,
                                         horiz_only=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


def test_banded_pallas_warp_inline_weights(monkeypatch):
    """inline_weights recomputes the x-weights per slab — same result."""
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def patched(*args, **kw):
        kw.setdefault("interpret", True)
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", patched)
    src, wx, wy = _warp_data(seed=7)
    a, ma = tv.warp_image_banded_pallas(src, wx, wy, r=4, bb=1)
    b, mb = tv.warp_image_banded_pallas(src, wx, wy, r=4, bb=1,
                                        inline_weights=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(ma), np.asarray(mb))


def test_warp_batched_pallas_cascade(monkeypatch):
    """warp_image_batched's TPU routing: the kernel on in-band flows, the
    exact fallback on wild flows — both matching the gather reference."""
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def patched(*args, **kw):
        kw.setdefault("interpret", True)
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", patched)
    # the test images are below the kernel's size gate — lift it so the
    # happy path actually exercises the kernel
    monkeypatch.setenv("OF_DIS_TPU_WARP_KERNEL_MIN_PX", "0")
    src, wx, wy = _warp_data(seed=9)
    ref, mref = tv.warp_image_batched(src, wx, wy, use_pallas=False, bb=1)
    out, mask = tv.warp_image_batched(src, wx, wy, use_pallas=True, bb=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(mref))
    # wild flow: the r=4 band check fails at runtime -> fallback branch
    wxw = wx + 9.0
    refw, _ = tv.warp_image_batched(src, wxw, wy, use_pallas=False, bb=1)
    outw, _ = tv.warp_image_batched(src, wxw, wy, use_pallas=True, bb=1)
    np.testing.assert_allclose(np.asarray(outw), np.asarray(refw),
                               atol=1e-3)


@pytest.mark.parametrize("c,h,w,rt", [(1, 28, 40, 16), (3, 40, 140, 16),
                                      (1, 44, 260, 24)])
def test_banded_pallas_warp_row_tiled(monkeypatch, c, h, w, rt):
    """rt > 0 row-tiles the kernel (two consecutive source row-blocks per
    program); must stay bit-identical to the XLA banded form, including a
    ragged final row block."""
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def patched(*args, **kw):
        kw.setdefault("interpret", True)
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", patched)
    src, wx, wy = _warp_data(c=c, h=h, w=w, seed=11)
    out, mask = tv.warp_image_banded_pallas(src, wx, wy, r=4, bb=1, rt=rt)
    xla = tv.warp_image_banded(src, wx, wy, r=4)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(xla))
    _, mask_ref = tv.warp_image_batched(src, wx, wy, use_pallas=False, bb=1)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(mask_ref))


def test_banded_pallas_warp_row_tiled_horiz(monkeypatch):
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def patched(*args, **kw):
        kw.setdefault("interpret", True)
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", patched)
    src, wx, _ = _warp_data(h=36, w=150, seed=13)
    wy = jnp.zeros_like(wx)
    out, _ = tv.warp_image_banded_pallas(src, wx, wy, r=4, bb=1,
                                         horiz_only=True, rt=16)
    # bit-identical to the untiled kernel (the kernel's horiz form already
    # differs from the XLA banded loop by FMA-contraction ulps)
    ref, _ = tv.warp_image_banded_pallas(src, wx, wy, r=4, bb=1,
                                         horiz_only=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    xla = tv.warp_image_banded(src, wx, wy, r=4, horiz_only=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(xla), atol=1e-3)
