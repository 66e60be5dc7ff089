"""Full-pipeline NumPy/cv2 oracle: the complete reference algorithm
(run_dense.cpp main flow) in scalar form, for end-to-end parity testing of
the JAX implementation. Uses OpenCV for the pyramid exactly as the reference
does, the scalar patch optimizer of oracle_dis, and the raster-sweep TV
refinement of oracle_tv (the reference's serial solver ordering)."""

from __future__ import annotations

import math

import cv2
import numpy as np

from tests.oracle import oracle_dis as od
from tests.oracle import oracle_tv as otv


def build_pyramid_cv(img, lv_f, pad):
    """ConstructImgPyramide (run_dense.cpp:131-179). img (C,H,W)."""
    imgs, dxs, dys = [], [], []
    cur = img.transpose(1, 2, 0).astype(np.float32)
    if cur.shape[2] == 1:
        cur = cur[:, :, 0]
    for lv in range(lv_f + 1):
        if lv > 0:
            cur = cv2.resize(cur, None, fx=0.5, fy=0.5,
                             interpolation=cv2.INTER_LINEAR)
        dx = cv2.Sobel(cur, cv2.CV_32F, 1, 0, ksize=3, scale=1 / 8.0)
        dy = cv2.Sobel(cur, cv2.CV_32F, 0, 1, ksize=3, scale=1 / 8.0)
        pi = cv2.copyMakeBorder(cur, pad, pad, pad, pad, cv2.BORDER_REPLICATE)
        px = cv2.copyMakeBorder(dx, pad, pad, pad, pad,
                                cv2.BORDER_CONSTANT, value=0)
        py = cv2.copyMakeBorder(dy, pad, pad, pad, pad,
                                cv2.BORDER_CONSTANT, value=0)

        def chw(x):
            return x[None] if x.ndim == 2 else x.transpose(2, 0, 1)

        imgs.append(chw(pi).copy())
        dxs.append(chw(px).copy())
        dys.append(chw(py).copy())
    return imgs, dxs, dys


def run_pipeline(img_a, img_b, prm, *, sc_f, sc_l, patove, usetvref=True,
                 tv_alpha=10.0, tv_gamma=10.0, tv_delta=5.0, tv_innerit=1,
                 tv_solverit=3, tv_sor=1.6, usefbcon=False):
    """Full coarse-to-fine run (OFClass ctor, oflow.cpp:118-330). Flow only
    (nop=2). img_a/img_b: (C,H,W) divisibility-padded. Returns flow at sc_l."""
    assert prm.nop == 2
    pad = prm.psz
    pyr_a = build_pyramid_cv(img_a, sc_f, pad)
    pyr_b = build_pyramid_cv(img_b, sc_f, pad)
    full_h, full_w = img_a.shape[1], img_a.shape[2]

    flow = None
    flow_bw = None
    for sl in range(sc_f, sc_l - 1, -1):
        w = int(full_w * 2.0 ** (-sl))
        h = int(full_h * 2.0 ** (-sl))
        bounds = (-prm.psz / 2.0, float(w + prm.psz // 2 - 2),
                  float(h + prm.psz // 2 - 2))
        ia, dxa, dya = (p[sl] for p in pyr_a)
        ib = pyr_b[0][sl]
        pts = od.grid_layout(w, h, prm.psz, patove)
        if flow is None:
            p_inits = np.zeros((len(pts), 2), np.float32)
        else:
            p_inits = od.init_from_coarser(pts, flow, w // 2, 2)
        results = []
        results_full = []
        compl = None
        for (px, py), p0 in zip(pts, p_inits):
            t, gx, gy = od.extract_nn(ia, dxa, dya, px, py, prm.psz, pad,
                                      prm.patnorm)
            hes = od.compute_hessian(gx, gy, 2)
            p, pw, pt = od.optimize_patch(ib, t, gx, gy, hes, px, py, p0, prm,
                                          bounds)
            results.append((p, pw))
            results_full.append((p, pw, pt))
        results_bw = None
        if usefbcon:
            # backward grid on image b, target a (oflow.cpp:162-169,
            # 193-196); warm-started from the coarser backward flow, run at
            # EVERY scale (its converged positions feed the forward merge)
            ia_b, dxa_b, dya_b = (p[sl] for p in pyr_b)
            ib_b = pyr_a[0][sl]
            compl = []
            results_bw = []
            p_inits_bw = (np.zeros((len(pts), 2), np.float32)
                          if flow_bw is None
                          else od.init_from_coarser(pts, flow_bw, w // 2, 2))
            for (px, py), p0 in zip(pts, p_inits_bw):
                t, gx, gy = od.extract_nn(ia_b, dxa_b, dya_b, px, py, prm.psz,
                                          pad, prm.patnorm)
                hes = od.compute_hessian(gx, gy, 2)
                p, pw, pt = od.optimize_patch(ib_b, t, gx, gy, hes, px, py,
                                              p0, prm, bounds)
                compl.append((p, pw, pt))
                results_bw.append((p, pw))
        flow = od.aggregate(w, h, prm.psz, 2, pts, results, compl)
        if usefbcon and sl > sc_l:
            # backward aggregation/TV skipped at the last scale
            # (oflow.cpp:266, 286); the forward results (with their
            # converged positions) are its complementary grid
            flow_bw = od.aggregate(w, h, prm.psz, 2, pts, results_bw,
                                   results_full)
        if usetvref:
            im1 = ia[:, pad:-pad, pad:-pad]
            im2 = pyr_b[0][sl][:, pad:-pad, pad:-pad]
            flow = tv_refine(flow, im1, im2, sl, tv_alpha, tv_gamma, tv_delta,
                             tv_innerit, tv_solverit, tv_sor)
            if usefbcon and sl > sc_l:
                flow_bw = tv_refine(flow_bw, im2, im1, sl, tv_alpha, tv_gamma,
                                    tv_delta, tv_innerit, tv_solverit, tv_sor)
    return flow


def tv_refine(flow, im1, im2, level, alpha, gamma, delta, innerit, solverit,
              sor):
    """RefLevelOF (refine_variational.cpp:152-247), raster SOR, gray/RGB."""
    wx = flow[:, :, 0].copy()
    wy = flow[:, :, 1].copy()
    qa = 0.25 * alpha
    hd3 = delta * 0.5 / 3.0
    hg3 = gamma * 0.5 / 3.0
    n_inner = innerit * (level + 1)
    wim2, mask = otv.warp(im2, wx, wy)
    I = otv.get_derivatives(im1, wim2)
    du = np.zeros_like(wx)
    dv = np.zeros_like(wy)
    uu, vv = wx.copy(), wy.copy()
    for _ in range(n_inner):
        wh, wv = otv.smoothness(uu, vv, qa)
        a11, a12, a22, b1, b2 = otv.compute_data_gray(mask, du, dv, I, hd3, hg3)
        b1 = otv.sub_laplacian(b1, wx, wh, wv)
        b2 = otv.sub_laplacian(b2, wy, wh, wv)
        du, dv = otv.sor_raster(du, dv, a11, a12, a22, b1, b2, wh, wv,
                                solverit, sor)
        uu = wx + du
        vv = wy + dv
    return np.stack([uu, vv], axis=-1)
