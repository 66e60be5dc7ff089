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
