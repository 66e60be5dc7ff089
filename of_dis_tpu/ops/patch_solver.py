"""Batched inverse-compositional Gauss-Newton patch optimizer (the DIS core).

TPU-first redesign of the reference's per-patch object machinery
(patch.{h,cpp}, patchgrid.{h,cpp}): the patch grid is a *batch dimension*.
All N patches of a scale advance together through masked Gauss-Newton
iterations inside one `lax.while_loop`; per-patch early stopping becomes an
`active` mask that reproduces the reference's convergence predicate exactly
(reference: patch.cpp:287-293, including min_iter gating). Note the reference
presets use min_iter == max_iter (run_dense.cpp:240-268), so the masked
fixed-trip loop wastes no work there.

Numerics replicated from the reference:
  - template + gradient extraction at integer positions, optional patch
    mean-normalization (patch.cpp:298-343),
  - 2x2 (flow) / 1x1 (depth) Hessian from template gradients with the
    det==0 -> +1e-10 guard (patch.cpp:69-86),
  - steepest-descent projection + closed-form SPD solve and p -= dp update
    (patch.cpp:170-184; Eigen LLT on a 2x2 == the closed form),
  - depth disparity sign clamp per camera (patch.cpp:186-191),
  - outlier/bounds reset to the start parameters (patch.cpp:196-206),
  - bilinear patch extraction with the constant 4-tap weight vector and
    ceil(+1e-5)/floor anchoring (patch.cpp:346-413),
  - L2 / L1 / pseudo-Huber residual + weight kernels (patch.cpp:221-273).

Known deviation (documented): when a patch's *initial* position is already
out of bounds, the reference marks it converged with pdiff = template and
leaves pweight uninitialized (patch.cpp:133-139 + patchgrid densify use).
We instead compute pweight by applying the cost-weight formula to the
template, which is deterministic and bounded; the case is rare (requires a
coarser-scale flow that pushes a patch fully outside the image).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from of_dis_tpu.params import (COST_HUBER, COST_L1, COST_L2, DISParams,
                               LevelSpec, NORMOUTLIER, grid_points)


class PatchTemplates(NamedTuple):
    """Per-level static patch data (outputs of InitializeGrid)."""
    tmpl: jnp.ndarray   # (N, P, P, C) template patch (mean-normalized if patnorm)
    tdx: jnp.ndarray    # (N, P, P, C) template x-gradient (never normalized)
    tdy: jnp.ndarray    # (N, P, P, C) template y-gradient
    hes: jnp.ndarray    # (N, 3) [H00, H01, H11] (flow) or (N, 1) (depth)


class PatchResult(NamedTuple):
    """Per-level optimization result (inputs to densification)."""
    p: jnp.ndarray        # (N, nop) final displacement parameters
    pt: jnp.ndarray       # (N, 2) final patch position (pt_ref + displacement)
    pweight: jnp.ndarray  # (N, P, P, C) final absolute-error weights
    iters: jnp.ndarray    # () iterations executed (diagnostic)


def grid_ref_points(spec: LevelSpec) -> jnp.ndarray:
    """(N, 2) float32 patch reference positions, column-major patch order
    i = x*noph + y (reference: patchgrid.cpp:61-75)."""
    xs, ys = grid_points(spec)
    return jnp.asarray(np.stack([xs, ys], axis=1), dtype=jnp.float32)


def _template_indices(spec: LevelSpec, psz: int) -> Tuple[np.ndarray, np.ndarray]:
    """Static (N, P) row/col gather indices into the padded image for the
    integer-position template windows (patch.cpp:311-325)."""
    xs, ys = grid_points(spec)
    lb = -psz // 2
    offs = np.arange(psz) + lb
    rows = (np.asarray(ys)[:, None] + offs[None, :] + spec.pad).astype(np.int32)
    cols = (np.asarray(xs)[:, None] + offs[None, :] + spec.pad).astype(np.int32)
    return rows, cols


def extract_templates(spec: LevelSpec, params: DISParams, im: jnp.ndarray,
                      dx: jnp.ndarray, dy: jnp.ndarray) -> PatchTemplates:
    """InitializeGrid: extract template patches + gradients, build Hessians.

    im/dx/dy: (C, Hp, Wp) padded level images. Reference: patch.cpp:55-86.
    """
    psz = params.p_samp_s
    rows, cols = _template_indices(spec, psz)
    r = jnp.asarray(rows)[:, :, None]   # (N, P, 1)
    c = jnp.asarray(cols)[:, None, :]   # (N, 1, P)

    def gather(imgs):
        # (C, Hp, Wp) -> (N, P, P, C)
        return jnp.transpose(imgs[:, r, c], (1, 2, 3, 0))

    tmpl = gather(im)
    tdx = gather(dx)
    tdy = gather(dy)
    if params.patnorm > 0:
        tmpl = tmpl - tmpl.mean(axis=(1, 2, 3), keepdims=True)

    h00 = jnp.sum(tdx * tdx, axis=(1, 2, 3))
    if params.nop == 2:
        h01 = jnp.sum(tdx * tdy, axis=(1, 2, 3))
        h11 = jnp.sum(tdy * tdy, axis=(1, 2, 3))
        det = h00 * h11 - h01 * h01
        guard = (det == 0.0).astype(h00.dtype) * 1e-10
        hes = jnp.stack([h00 + guard, h01, h11 + guard], axis=1)
    else:
        guard = (h00 == 0.0).astype(h00.dtype) * 1e-10
        hes = (h00 + guard)[:, None]
    return PatchTemplates(tmpl, tdx, tdy, hes)


def _extract_bilinear_one(im: jnp.ndarray, pt: jnp.ndarray, psz: int,
                          pad: int) -> jnp.ndarray:
    """Bilinear patch extraction at a float position (patch.cpp:346-413).

    The fractional part is constant across the patch, so the patch is a
    4-weight combination of one integer-anchored (P+1)x(P+1) window.
    Returns (P, P, C).
    """
    pos_c = jnp.ceil(pt + 1e-5).astype(jnp.int32)       # ceil anchor
    resid = pt - jnp.floor(pt)                           # vs floor (patch.cpp:361)
    rx, ry = resid[0], resid[1]
    w_cc = rx * ry            # sample at (ceil_x, ceil_y)
    w_fc = (1.0 - rx) * ry    # (ceil_x - 1, ceil_y)
    w_cf = rx * (1.0 - ry)    # (ceil_x, ceil_y - 1)
    w_ff = (1.0 - rx) * (1.0 - ry)
    start_y = pos_c[1] - psz // 2 - 1 + pad
    start_x = pos_c[0] - psz // 2 - 1 + pad
    c = im.shape[0]
    win = jax.lax.dynamic_slice(im, (0, start_y, start_x), (c, psz + 1, psz + 1))
    patch = (w_cc * win[:, 1:, 1:] + w_fc * win[:, 1:, :-1]
             + w_cf * win[:, :-1, 1:] + w_ff * win[:, :-1, :-1])
    return jnp.transpose(patch, (1, 2, 0))


def extract_bilinear(im: jnp.ndarray, pts: jnp.ndarray, psz: int,
                     pad: int) -> jnp.ndarray:
    """(C,Hp,Wp), (N,2) -> (N,P,P,C) batched bilinear patch extraction."""
    return jax.vmap(lambda p: _extract_bilinear_one(im, p, psz, pad))(pts)


def loss_error_image(diff: jnp.ndarray, costfct: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Residual transform + weights per cost function (patch.cpp:221-273).

    diff = extracted_patch - template. Returns (pdiff, pweight).
    """
    if costfct == COST_L2:
        return diff, jnp.abs(diff)
    if costfct == COST_L1:
        w = jnp.sqrt(jnp.abs(diff))
        return jnp.copysign(w, diff), w
    if costfct == COST_HUBER:
        bsq = NORMOUTLIER * NORMOUTLIER
        w = jnp.sqrt(2.0 * bsq * (jnp.sqrt(1.0 + diff * diff / bsq) - 1.0))
        return jnp.copysign(w, diff), w
    # costfct outside {0,1,2}: the reference computes nothing (patch.cpp:228-272
    # falls through), leaving pdiff/pweight stale; we define it as zeros.
    return jnp.zeros_like(diff), jnp.zeros_like(diff)


def _solve_step(hes: jnp.ndarray, rhs: jnp.ndarray, nop: int) -> jnp.ndarray:
    """Closed-form SPD solve of H dp = rhs (Eigen .llt().solve, patch.cpp:182)."""
    if nop == 2:
        h00, h01, h11 = hes[:, 0], hes[:, 1], hes[:, 2]
        det = h00 * h11 - h01 * h01
        dp0 = (h11 * rhs[:, 0] - h01 * rhs[:, 1]) / det
        dp1 = (h00 * rhs[:, 1] - h01 * rhs[:, 0]) / det
        return jnp.stack([dp0, dp1], axis=1)
    return rhs / hes


@partial(jax.jit, static_argnames=("spec", "params"))
def optimize_level(spec: LevelSpec, params: DISParams, im_b: jnp.ndarray,
                   tpl: PatchTemplates, p_init: jnp.ndarray) -> PatchResult:
    """Optimize all patches of one scale (PatGridClass::Optimize,
    patchgrid.cpp:134-141 + PatClass::OptimizeIter, patch.cpp:156-210).

    im_b: (C, Hp, Wp) padded target image at this level.
    p_init: (N, nop) initial displacements (zero at the coarsest scale, else
    from InitializeFromCoarserOF).
    """
    psz, pad, nop = params.p_samp_s, spec.pad, params.nop
    novals = float(params.novals)
    pt_ref = grid_ref_points(spec)
    n = pt_ref.shape[0]

    def to_pt(p):
        if nop == 2:
            return pt_ref + p
        return pt_ref + jnp.concatenate([p, jnp.zeros_like(p)], axis=1)

    def oob(pt):
        return ((pt[:, 0] < spec.tmp_lb) | (pt[:, 1] < spec.tmp_lb)
                | (pt[:, 0] > spec.tmp_ubw) | (pt[:, 1] > spec.tmp_ubh))

    def compute_err(pt):
        patch = extract_bilinear(im_b, pt, psz, pad)
        if params.patnorm > 0:
            patch = patch - patch.mean(axis=(1, 2, 3), keepdims=True)
        pdiff, pweight = loss_error_image(patch - tpl.tmpl, params.costfct)
        mares = jnp.sum(pweight, axis=(1, 2, 3)) / novals
        return pdiff, pweight, mares

    # ---- OptimizeStart (patch.cpp:118-154)
    pt0 = to_pt(p_init)
    init_oob = oob(pt0)
    pt0_safe = jnp.where(init_oob[:, None], pt_ref, pt0)  # safe gather pos only
    pdiff0, pweight0, mares0 = compute_err(pt0_safe)
    # init-OOB patches: pdiff = template; pweight = cost-weight of template
    # (documented deviation, see module docstring)
    tmpl_pd, tmpl_pw = loss_error_image(tpl.tmpl, params.costfct)
    m = init_oob[:, None, None, None]
    pdiff0 = jnp.where(m, tpl.tmpl, pdiff0)
    pweight0 = jnp.where(m, tmpl_pw, pweight0)
    # cnt==0 convergence: only the residual threshold can stop here
    active0 = (~init_oob) & (params.max_iter > 0) & (mares0 > params.res_thresh)

    state = dict(
        p=p_init, pdiff=pdiff0, pweight=pweight0, active=active0,
        mares=mares0, mares_old=jnp.full((n,), 1e5, jnp.float32),
        dpn_init=jnp.full((n,), 1e-10, jnp.float32),
        it=jnp.asarray(0, jnp.int32),
    )

    def cond(s):
        return (s["it"] < params.max_iter) & jnp.any(s["active"])

    def body(s):
        act = s["active"]
        it1 = s["it"] + 1
        # steepest-descent projection (patch.cpp:175-180)
        rhs0 = jnp.sum(tpl.tdx * s["pdiff"], axis=(1, 2, 3))
        if nop == 2:
            rhs1 = jnp.sum(tpl.tdy * s["pdiff"], axis=(1, 2, 3))
            rhs = jnp.stack([rhs0, rhs1], axis=1)
        else:
            rhs = rhs0[:, None]
        dp = _solve_step(tpl.hes, rhs, nop)
        p_new = s["p"] - dp
        if nop == 1:  # depth disparity sign clamp (patch.cpp:186-191)
            if spec.camlr == 0:
                p_new = jnp.minimum(p_new, 0.0)
            else:
                p_new = jnp.maximum(p_new, 0.0)
        pt_new = to_pt(p_new)
        # outlier / out-of-bounds reset (patch.cpp:196-206)
        moved = jnp.linalg.norm(pt_new - pt0, axis=1)
        reset = (moved > params.outlierthresh) | oob(pt_new)
        p_new = jnp.where(reset[:, None], p_init, p_new)
        pt_new = to_pt(p_new)
        # error image at the new position (patch.cpp:275-295)
        pdiff_new, pweight_new, mares_new = compute_err(pt_new)
        dp_sqnorm = jnp.sum(dp * dp, axis=1)
        dpn_init = jnp.where(it1 == 1, dp_sqnorm, s["dpn_init"])
        # convergence predicate (patch.cpp:290-293)
        keep = ((it1 < params.max_iter)
                & (mares_new > params.res_thresh)
                & ((it1 < params.min_iter)
                   | (dp_sqnorm / dpn_init >= params.dp_thresh_sq))
                & ((it1 < params.min_iter)
                   | (mares_new / s["mares"] <= params.dr_thresh)))
        active_new = act & keep & (~reset)

        def sel(new, old):
            mask = act.reshape((-1,) + (1,) * (new.ndim - 1))
            return jnp.where(mask, new, old)

        return dict(
            p=sel(p_new, s["p"]), pdiff=sel(pdiff_new, s["pdiff"]),
            pweight=sel(pweight_new, s["pweight"]),
            active=act & active_new,
            mares=sel(mares_new, s["mares"]),
            mares_old=sel(s["mares"], s["mares_old"]),
            dpn_init=sel(dpn_init, s["dpn_init"]),
            it=it1,
        )

    final = jax.lax.while_loop(cond, body, state)
    p = final["p"]
    return PatchResult(p=p, pt=to_pt(p), pweight=final["pweight"],
                       iters=final["it"])


def init_from_coarser(spec: LevelSpec, params: DISParams,
                      flow_prev: jnp.ndarray) -> jnp.ndarray:
    """InitializeFromCoarserOF (patchgrid.cpp:195-211): nearest-pixel lookup of
    the previous (coarser) scale's dense flow, scaled x2.

    flow_prev: (h/2, w/2, nop) dense flow at the coarser scale.
    Returns (N, nop) initial parameters.
    """
    xs, ys = grid_points(spec)
    px = (np.asarray(xs) // 2).astype(np.int32)
    py = (np.asarray(ys) // 2).astype(np.int32)
    return flow_prev[jnp.asarray(py), jnp.asarray(px), :] * 2.0
