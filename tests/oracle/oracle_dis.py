"""NumPy oracle: a direct scalar transliteration of the reference DIS patch
optimizer semantics (patch.cpp / patchgrid.cpp), used to golden-test the
batched JAX implementation. Line citations refer to /root/reference.

This is intentionally slow and simple — per-patch Python loops mirroring the
C++ control flow exactly.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

MINERRVAL = 2.0
NORMOUTLIER = 5.0


def extract_nn(img, dx, dy, ptx, pty, psz, pad, patnorm):
    """getPatchStaticNNGrad (patch.cpp:298-343). img/dx/dy: (C,Hp,Wp).
    Returns (P,P,C) template, dxx, dyy."""
    posx = int(round(ptx)) + pad
    posy = int(round(pty)) + pad
    lb = -psz // 2
    t = img[:, posy + lb: posy + lb + psz, posx + lb: posx + lb + psz]
    gx = dx[:, posy + lb: posy + lb + psz, posx + lb: posx + lb + psz]
    gy = dy[:, posy + lb: posy + lb + psz, posx + lb: posx + lb + psz]
    t = t.transpose(1, 2, 0).astype(np.float32).copy()
    gx = gx.transpose(1, 2, 0).astype(np.float32).copy()
    gy = gy.transpose(1, 2, 0).astype(np.float32).copy()
    if patnorm > 0:
        t -= t.sum() / t.size
    return t, gx, gy


def extract_bil(img, ptx, pty, psz, pad, patnorm):
    """getPatchStaticBil (patch.cpp:346-413). Returns (P,P,C)."""
    pos0 = math.ceil(ptx + 0.00001)
    pos1 = math.ceil(pty + 0.00001)
    pos2 = math.floor(ptx)
    pos3 = math.floor(pty)
    rx = ptx - pos2
    ry = pty - pos3
    w0 = rx * ry           # sample at (ceil_x, ceil_y)
    w1 = (1 - rx) * ry     # (ceil_x-1, ceil_y)
    w2 = rx * (1 - ry)     # (ceil_x, ceil_y-1)
    w3 = (1 - rx) * (1 - ry)
    lb = -psz // 2
    out = np.zeros((psz, psz, img.shape[0]), np.float32)
    for j in range(psz):
        for i in range(psz):
            yy = pos1 + lb + j + pad
            xx = pos0 + lb + i + pad
            a = img[:, yy, xx]
            b = img[:, yy, xx - 1]
            c = img[:, yy - 1, xx]
            d = img[:, yy - 1, xx - 1]
            out[j, i] = w0 * a + w1 * b + w2 * c + w3 * d
    if patnorm > 0:
        out -= out.sum() / out.size
    return out


def compute_hessian(gx, gy, nop):
    """ComputeHessian (patch.cpp:69-86)."""
    h00 = float((gx * gx).sum())
    if nop == 2:
        h01 = float((gx * gy).sum())
        h11 = float((gy * gy).sum())
        if h00 * h11 - h01 * h01 == 0:
            h00 += 1e-10
            h11 += 1e-10
        return np.array([[h00, h01], [h01, h11]], np.float32)
    if h00 == 0:
        h00 += 1e-10
    return np.array([[h00]], np.float32)


def loss(diff, costfct):
    """LossComputeErrorImage (patch.cpp:221-273)."""
    if costfct == 0:
        return diff.copy(), np.abs(diff)
    if costfct == 1:
        w = np.sqrt(np.abs(diff))
        return np.copysign(w, diff), w
    if costfct == 2:
        bsq = NORMOUTLIER ** 2
        w = np.sqrt(2 * bsq * (np.sqrt(1 + diff * diff / bsq) - 1))
        return np.copysign(w, diff), w
    return np.zeros_like(diff), np.zeros_like(diff)


@dataclass
class OracleParams:
    psz: int = 8
    max_iter: int = 12
    min_iter: int = 12
    dp_thresh: float = 0.05      # un-squared; squared on use (oflow.cpp:87)
    dr_thresh: float = 0.95
    res_thresh: float = 0.0
    patnorm: int = 1
    costfct: int = 0
    nop: int = 2
    outlierthresh: float = field(init=False)

    def __post_init__(self):
        self.outlierthresh = self.psz / 2.0


def optimize_patch(im_b, tmpl, gx, gy, hes, ptx, pty, p_init, prm, spec_bounds,
                   camlr=0):
    """PatClass::OptimizeIter(p, untilconv=True) (patch.cpp:117-210).

    spec_bounds = (tmp_lb, tmp_ubw, tmp_ubh). Returns (p, pweight, pt)."""
    lbnd, ubw, ubh = spec_bounds
    pad = prm.psz  # reference pads by patch size
    nop = prm.nop
    p = np.array(p_init, np.float32).reshape(nop)
    pt = np.array([ptx + p[0], pty + (p[1] if nop == 2 else 0.0)], np.float32)
    pt_st = pt.copy()

    def oob(q):
        return q[0] < lbnd or q[1] < lbnd or q[0] > ubw or q[1] > ubh

    if oob(pt):
        # OptimizeStart invalid branch (patch.cpp:133-139): converged
        # immediately with pdiff = template; pweight defined (deviation) as
        # the cost weight of the template.
        _, pw = loss(tmpl, prm.costfct)
        return p, pw, pt

    novals = tmpl.size

    def err_at(q):
        patch = extract_bil(im_b, float(q[0]), float(q[1]), prm.psz, pad,
                            prm.patnorm)
        pd, pw = loss(patch - tmpl, prm.costfct)
        return pd, pw, float(pw.sum()) / novals

    pdiff, pweight, mares = err_at(pt)
    mares_old = 1e5
    dpn_init = 1e-10
    dpn = 1e-10
    cnt = 0
    dp_thresh_sq = prm.dp_thresh * prm.dp_thresh

    def stop(cnt, mares, mares_old, dpn, dpn_init):
        return not (cnt < prm.max_iter and mares > prm.res_thresh
                    and (cnt < prm.min_iter or dpn / dpn_init >= dp_thresh_sq)
                    and (cnt < prm.min_iter or mares / mares_old <= prm.dr_thresh))

    converged = stop(cnt, mares, mares_old, dpn, dpn_init)
    while not converged:
        cnt += 1
        rhs = np.array([(gx * pdiff).sum()]
                       + ([(gy * pdiff).sum()] if nop == 2 else []), np.float32)
        if nop == 2:  # closed-form SPD solve (== Eigen .llt() on a 2x2)
            h00, h01, h11 = hes[0, 0], hes[0, 1], hes[1, 1]
            det = h00 * h11 - h01 * h01
            dp = np.array([(h11 * rhs[0] - h01 * rhs[1]) / det,
                           (h00 * rhs[1] - h01 * rhs[0]) / det], np.float32)
        else:
            dp = (rhs / hes[0, 0]).astype(np.float32)
        p = p - dp
        if nop == 1:
            p[0] = min(p[0], 0.0) if camlr == 0 else max(p[0], 0.0)
        pt = np.array([ptx + p[0], pty + (p[1] if nop == 2 else 0.0)], np.float32)
        if (np.linalg.norm(pt_st - pt) > prm.outlierthresh) or oob(pt):
            p = np.array(p_init, np.float32).reshape(nop)
            pt = np.array([ptx + p[0], pty + (p[1] if nop == 2 else 0.0)],
                          np.float32)
            converged = True
        pdiff, pweight, mares_new = err_at(pt)
        dpn = float((dp * dp).sum())
        if cnt == 1:
            dpn_init = dpn
        mares_old = mares
        mares = mares_new
        if stop(cnt, mares, mares_old, dpn, dpn_init):
            converged = True
    return p, pweight, pt


def grid_layout(w, h, psz, patove):
    """PatGridClass grid geometry (patchgrid.cpp:41-75, oflow.cpp:90)."""
    steps = max(1, int(math.floor(psz * (1 - patove))))
    nopw = int(math.ceil(w / steps))
    noph = int(math.ceil(h / steps))
    offw = int(math.floor((w - (nopw - 1) * steps) / 2))
    offh = int(math.floor((h - (noph - 1) * steps) / 2))
    pts = []
    for x in range(nopw):
        for y in range(noph):
            pts.append((x * steps + offw, y * steps + offh))
    return pts


def aggregate(w, h, psz, nop, pts, results, compl_results=None):
    """AggregateFlowDense (patchgrid.cpp:213-397). results: list of
    (p, pweight) per patch; compl_results: list of (p, pweight, pt)."""
    flow = np.zeros((h * w, nop), np.float32)
    we = np.zeros(h * w, np.float32)
    lb = -psz // 2
    ub = psz // 2 - 1
    for (px, py), (p, pw) in zip(pts, results):
        for j, y in enumerate(range(lb, ub + 1)):
            for i, x in enumerate(range(lb, ub + 1)):
                yt = y + py
                xt = x + px
                if 0 <= xt < w and 0 <= yt < h:
                    absw = 1.0 / sum(max(MINERRVAL, float(c))
                                     for c in np.atleast_1d(pw[j, i]))
                    k = yt * w + xt
                    we[k] += absw
                    flow[k] += p * absw
    if compl_results is not None:
        for (p, pw, pt) in compl_results:
            pos0 = math.ceil(pt[0] + 0.00001)
            pos1 = math.ceil(pt[1] + 0.00001)
            rx = pt[0] - math.floor(pt[0])
            ry = pt[1] - math.floor(pt[1])
            wb = [rx * ry, (1 - rx) * ry, rx * (1 - ry), (1 - rx) * (1 - ry)]
            for j, y in enumerate(range(lb, ub + 1)):
                for i, x in enumerate(range(lb, ub + 1)):
                    yt = y + pos1
                    xt = x + pos0
                    if 1 <= xt < w - 1 and 1 <= yt < h - 1:
                        absw = 1.0 / sum(max(MINERRVAL, float(c))
                                         for c in np.atleast_1d(pw[j, i]))
                        fl = p * absw
                        for k, (ddx, ddy) in enumerate([(0, 0), (-1, 0),
                                                        (0, -1), (-1, -1)]):
                            kk = (yt + ddy) * w + (xt + ddx)
                            we[kk] += wb[k] * absw
                            flow[kk] -= wb[k] * fl
    nz = we > 0
    flow[nz] /= we[nz, None]
    return flow.reshape(h, w, nop)


def init_from_coarser(pts, flow_prev, w, nop):
    """InitializeFromCoarserOF (patchgrid.cpp:195-211)."""
    out = np.zeros((len(pts), nop), np.float32)
    for ip, (px, py) in enumerate(pts):
        x = int(math.floor(px / 2))
        y = int(math.floor(py / 2))
        out[ip] = flow_prev[y, x, :nop] * 2
    return out
