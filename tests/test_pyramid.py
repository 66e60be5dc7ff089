"""Pyramid numerics vs OpenCV (the reference's L5 uses cv::resize / cv::Sobel /
cv::copyMakeBorder directly — run_dense.cpp:131-179, 299-311)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

from of_dis_tpu.ops import pyramid
from of_dis_tpu.params import pad_amounts


def _rand_img(h, w, c=1, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.random((c, h, w)) * 255.0).astype(np.float32)


def test_halve_matches_cv_resize():
    img = _rand_img(64, 96)
    ours = np.asarray(pyramid.halve(jnp.asarray(img)))[0]
    ref = cv2.resize(img[0], None, fx=0.5, fy=0.5, interpolation=cv2.INTER_LINEAR)
    # the box-mean matrix is bf16-exact, so halve runs as hi/lo bf16 MXU
    # dots: ~1e-5 relative of the 0..255 intensity scale
    np.testing.assert_allclose(ours, ref, rtol=0, atol=5e-3)


def test_halve_matches_cv_resize_rgb():
    img = _rand_img(32, 48, c=3, seed=1)
    ours = np.asarray(pyramid.halve(jnp.asarray(img)))
    ref = cv2.resize(img.transpose(1, 2, 0), None, fx=0.5, fy=0.5,
                     interpolation=cv2.INTER_LINEAR).transpose(2, 0, 1)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=5e-3)


def test_sobel_matches_cv():
    img = _rand_img(40, 56, seed=2)
    dx = np.asarray(pyramid.sobel_dx(jnp.asarray(img)))[0]
    dy = np.asarray(pyramid.sobel_dy(jnp.asarray(img)))[0]
    ref_dx = cv2.Sobel(img[0], cv2.CV_32F, 1, 0, ksize=3, scale=1 / 8.0,
                       delta=0, borderType=cv2.BORDER_DEFAULT)
    ref_dy = cv2.Sobel(img[0], cv2.CV_32F, 0, 1, ksize=3, scale=1 / 8.0,
                       delta=0, borderType=cv2.BORDER_DEFAULT)
    np.testing.assert_allclose(dx, ref_dx, rtol=0, atol=1e-3)
    np.testing.assert_allclose(dy, ref_dy, rtol=0, atol=1e-3)


def test_pad_to_divisible_matches_cv_copymakeborder():
    img = _rand_img(436, 1024, seed=3)
    lv_f = 5
    ours = np.asarray(pyramid.pad_to_divisible(jnp.asarray(img), lv_f))[0]
    t, b, l, r = pad_amounts(1024, 436, lv_f)
    ref = cv2.copyMakeBorder(img[0], t, b, l, r, cv2.BORDER_REPLICATE)
    assert ours.shape == ref.shape
    np.testing.assert_array_equal(ours, ref)


def test_build_pyramid_shapes_and_gradient_padding():
    img = _rand_img(64, 128, seed=4)
    psz = 8
    imgs, dxs, dys = pyramid.build_pyramid(jnp.asarray(img), lv_f=3, pad=psz)
    assert len(imgs) == 4
    for lv, (im, dx, dy) in enumerate(zip(imgs, dxs, dys)):
        h, w = 64 >> lv, 128 >> lv
        assert im.shape == (1, h + 2 * psz, w + 2 * psz)
        assert dx.shape == im.shape and dy.shape == im.shape
        # gradient padding is zero, image padding replicates
        assert float(jnp.abs(dx[:, :psz, :]).max()) == 0.0
        assert float(jnp.abs(dy[:, :, :psz]).max()) == 0.0
        np.testing.assert_array_equal(np.asarray(im[0, 0, psz:-psz]),
                                      np.asarray(im[0, psz, psz:-psz]))


def test_pyramid_level_vs_cv_chain():
    """Full chain: repeated cv::resize(0.5) + Sobel must match our pyramid."""
    img = _rand_img(96, 160, seed=5)
    psz = 4
    imgs, dxs, _ = pyramid.build_pyramid(jnp.asarray(img), lv_f=2, pad=psz)
    ref = img[0]
    for lv in range(3):
        if lv > 0:
            ref = cv2.resize(ref, None, fx=0.5, fy=0.5,
                             interpolation=cv2.INTER_LINEAR)
        ref_dx = cv2.Sobel(ref, cv2.CV_32F, 1, 0, ksize=3, scale=1 / 8.0)
        np.testing.assert_allclose(np.asarray(imgs[lv][0, psz:-psz, psz:-psz]),
                                   ref, rtol=0, atol=2e-3)
        np.testing.assert_allclose(np.asarray(dxs[lv][0, psz:-psz, psz:-psz]),
                                   ref_dx, rtol=0, atol=2e-3)


def test_resize_linear_matches_cv_upscale():
    img = _rand_img(16, 24, seed=6)
    ours = np.asarray(pyramid.resize_linear(jnp.asarray(img), 64, 96))[0]
    ref = cv2.resize(img[0], (96, 64), interpolation=cv2.INTER_LINEAR)
    # power-of-two upscale weights are bf16-exact -> hi/lo bf16 MXU path
    np.testing.assert_allclose(ours, ref, rtol=0, atol=5e-3)


def test_u8_input_bit_exact_vs_f32():
    """u8 images take the single-dot bf16 ingestion path (no `lo` term);
    must be bit-identical to the f32 path on the same integer values —
    both for the coarse box-jump (lv_l>0) and the halve-chain (lv_l=0)."""
    rng = np.random.default_rng(7)
    u8 = rng.integers(0, 256, (1, 64, 128), dtype=np.uint8)
    f32 = u8.astype(np.float32)
    for lv_l in (0, 2):
        out_u8 = pyramid.build_pyramid(jnp.asarray(u8), lv_f=3, pad=4,
                                       lv_l=lv_l)
        out_f32 = pyramid.build_pyramid(jnp.asarray(f32), lv_f=3, pad=4,
                                        lv_l=lv_l)
        for field_u8, field_f32 in zip(out_u8, out_f32):
            for a, b in zip(field_u8, field_f32):
                if a is None:
                    assert b is None
                    continue
                assert a.dtype == jnp.float32
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_u8_end_to_end_bit_exact():
    """Full dis_flow on u8 inputs == on f32 of the same values."""
    from of_dis_tpu.models import dis
    from of_dis_tpu.params import op_point_params

    rng = np.random.default_rng(8)
    h, w = 64, 128
    base = rng.integers(0, 256, (1, h, w), dtype=np.uint8)
    shift = np.roll(base, (2, 1), axis=(1, 2))
    params = op_point_params(w, 2, nop=2, noc=1, verbosity=0)
    a8 = pyramid.pad_to_divisible(jnp.asarray(base), params.sc_f)
    b8 = pyramid.pad_to_divisible(jnp.asarray(shift), params.sc_f)
    af = pyramid.pad_to_divisible(jnp.asarray(base.astype(np.float32)),
                                  params.sc_f)
    bf = pyramid.pad_to_divisible(jnp.asarray(shift.astype(np.float32)),
                                  params.sc_f)
    fw, fh = int(a8.shape[2]), int(a8.shape[1])
    out8 = dis.dis_flow(a8, b8, params, fw, fh)
    outf = dis.dis_flow(af, bf, params, fw, fh)
    np.testing.assert_array_equal(np.asarray(out8), np.asarray(outf))
