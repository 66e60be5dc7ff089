"""NumPy oracle for the TV refinement stack: scalar transliteration of
opticalflow_aux.c / solver.c / refine_variational.cpp semantics."""

from __future__ import annotations

import math

import numpy as np

DATANORM = 0.01
EPS = 1e-6


def warp(src, wx, wy):
    """image_warp (opticalflow_aux.c:33-75). src (C,H,W)."""
    c, h, w = src.shape
    dst = np.zeros_like(src)
    mask = np.zeros((h, w), np.float32)
    for j in range(h):
        for i in range(w):
            xx = i + wx[j, i]
            yy = j + wy[j, i]
            x = math.floor(xx)
            y = math.floor(yy)
            dx = xx - x
            dy = yy - y
            mask[j, i] = float(0 <= xx <= w - 1 and 0 <= yy <= h - 1)
            x1 = min(max(x, 0), w - 1)
            x2 = min(max(x + 1, 0), w - 1)
            y1 = min(max(y, 0), h - 1)
            y2 = min(max(y + 1, 0), h - 1)
            dst[:, j, i] = (src[:, y1, x1] * (1 - dx) * (1 - dy)
                            + src[:, y1, x2] * dx * (1 - dy)
                            + src[:, y2, x1] * (1 - dx) * dy
                            + src[:, y2, x2] * dx * dy)
    return dst, mask


def conv_clamp(x, coeffs, axis):
    """1-D convolution with clamp-to-edge borders (the fast-3/fast-5 paths of
    image.cpp:419-624)."""
    r = len(coeffs) // 2
    n = x.shape[axis]
    out = np.zeros_like(x)
    for k, c in enumerate(coeffs):
        off = k - r
        idx = np.clip(np.arange(n) + off, 0, n - 1)
        out += c * np.take(x, idx, axis=axis)
    return out


D5 = [1 / 12.0, -8 / 12.0, 0.0, 8 / 12.0, -1 / 12.0]
D3 = [-0.5, 0.0, 0.5]


def get_derivatives(im1, wim2):
    tmp = 0.5 * (im1 + wim2)
    iz = wim2 - im1
    ix = conv_clamp(tmp, D5, 2)
    iy = conv_clamp(tmp, D5, 1)
    return (ix, iy, iz, conv_clamp(ix, D5, 2), conv_clamp(ix, D5, 1),
            conv_clamp(iy, D5, 1), conv_clamp(iz, D5, 2), conv_clamp(iz, D5, 1))


def smoothness(uu, vv, qa):
    ux = conv_clamp(uu, D3, 1)
    uy = conv_clamp(uu, D3, 0)
    vx = conv_clamp(vv, D3, 1)
    vy = conv_clamp(vv, D3, 0)
    s = qa / np.sqrt(EPS + ux ** 2 + uy ** 2 + vx ** 2 + vy ** 2)
    h = np.zeros_like(s)
    v = np.zeros_like(s)
    h[:, :-1] = s[:, :-1] + s[:, 1:]
    v[:-1, :] = s[:-1, :] + s[1:, :]
    return h, v


def sub_laplacian(b, src, wh, wv):
    b = b.copy()
    hgt, wid = src.shape
    for j in range(hgt):
        for i in range(wid - 1):
            t = wh[j, i] * (src[j, i + 1] - src[j, i])
            b[j, i] += t
            b[j, i + 1] -= t
    for j in range(hgt - 1):
        for i in range(wid):
            t = wv[j, i] * (src[j + 1, i] - src[j, i])
            b[j, i] += t
            b[j + 1, i] -= t
    return b


def sor_raster(du, dv, a11, a12, a22, b1, b2, wh, wv, iters, omega):
    """sor_coupled_slow_but_readable (solver.c:34-78): serial raster sweep."""
    du = du.copy()
    dv = dv.copy()
    h, w = du.shape
    for _ in range(iters):
        for j in range(h):
            for i in range(w):
                su = sv = sw = 0.0
                if j > 0:
                    su -= wv[j - 1, i] * du[j - 1, i]
                    sv -= wv[j - 1, i] * dv[j - 1, i]
                    sw += wv[j - 1, i]
                if i > 0:
                    su -= wh[j, i - 1] * du[j, i - 1]
                    sv -= wh[j, i - 1] * dv[j, i - 1]
                    sw += wh[j, i - 1]
                if j < h - 1:
                    su -= wv[j, i] * du[j + 1, i]
                    sv -= wv[j, i] * dv[j + 1, i]
                    sw += wv[j, i]
                if i < w - 1:
                    su -= wh[j, i] * du[j, i + 1]
                    sv -= wh[j, i] * dv[j, i + 1]
                    sw += wh[j, i]
                A11 = a11[j, i] + sw
                A22 = a22[j, i] + sw
                B1 = b1[j, i] - su
                B2 = b2[j, i] - sv
                du[j, i] = (1 - omega) * du[j, i] + omega / A11 * (
                    B1 - a12[j, i] * dv[j, i])
                dv[j, i] = (1 - omega) * dv[j, i] + omega / A22 * (
                    B2 - a12[j, i] * du[j, i])
    return du, dv


def sor_redblack(du, dv, a11, a12, a22, b1, b2, wh, wv, iters, omega):
    """Same per-pixel update, red-black ordering (mirrors ops/tv.py)."""
    du = du.copy()
    dv = dv.copy()
    h, w = du.shape
    for _ in range(iters):
        for color in (0, 1):
            for j in range(h):
                for i in range(w):
                    if (i + j) % 2 != color:
                        continue
                    su = sv = sw = 0.0
                    if j > 0:
                        su -= wv[j - 1, i] * du[j - 1, i]
                        sv -= wv[j - 1, i] * dv[j - 1, i]
                        sw += wv[j - 1, i]
                    if i > 0:
                        su -= wh[j, i - 1] * du[j, i - 1]
                        sv -= wh[j, i - 1] * dv[j, i - 1]
                        sw += wh[j, i - 1]
                    if j < h - 1:
                        su -= wv[j, i] * du[j + 1, i]
                        sv -= wv[j, i] * dv[j + 1, i]
                        sw += wv[j, i]
                    if i < w - 1:
                        su -= wh[j, i] * du[j, i + 1]
                        sv -= wh[j, i] * dv[j, i + 1]
                        sw += wh[j, i]
                    A11 = a11[j, i] + sw
                    A22 = a22[j, i] + sw
                    B1 = b1[j, i] - su
                    B2 = b2[j, i] - sv
                    du[j, i] = (1 - omega) * du[j, i] + omega / A11 * (
                        B1 - a12[j, i] * dv[j, i])
                    # dv uses the freshly updated du (solver.c:74)
                    dv[j, i] = (1 - omega) * dv[j, i] + omega / A22 * (
                        B2 - a12[j, i] * du[j, i])
    return du, dv


def compute_data_gray(mask, du, dv, I, hd3, hg3):
    ix, iy, iz, ixx, ixy, iyy, ixz, iyz = [c[0] for c in I]
    a11 = np.zeros_like(mask)
    a12 = np.zeros_like(mask)
    a22 = np.zeros_like(mask)
    b1 = np.zeros_like(mask)
    b2 = np.zeros_like(mask)
    if hd3:
        t2 = iz + ix * du + iy * dv
        n1 = DATANORM + ix ** 2 + iy ** 2
        t = mask * hd3 / np.sqrt(EPS + 3 * (t2 ** 2 / n1))
        t3 = t / n1
        tx = t3 * ix
        ty = t3 * iy
        a11 += tx * ix
        a12 += tx * iy
        a22 += ty * iy
        b1 -= tx * iz
        b2 -= ty * iz
    t2 = ixz + ixx * du + ixy * dv
    t3 = iyz + ixy * du + iyy * dv
    xy2 = ixy ** 2
    n1 = xy2 + DATANORM + ixx ** 2
    n2 = xy2 + DATANORM + iyy ** 2
    t = mask * hg3 / np.sqrt(EPS + 3 * (t2 ** 2 / n1 + t3 ** 2 / n2))
    tn2 = t / n2
    tn1 = t / n1
    a12 += (tn1 * ixx + tn2 * iyy) * ixy
    b1 -= tn1 * ixx * ixz + tn2 * ixy * iyz
    b2 -= tn2 * iyy * iyz + tn1 * ixy * ixz
    a11 += tn1 * ixx ** 2 + tn2 * xy2
    a22 += tn2 * iyy ** 2 + tn1 * xy2
    return 3 * a11, 3 * a12, 3 * a22, 3 * b1, 3 * b2
