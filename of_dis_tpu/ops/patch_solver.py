"""Batched inverse-compositional Gauss-Newton patch optimizer (the DIS core).

TPU-first redesign of the reference's per-patch object machinery
(patch.{h,cpp}, patchgrid.{h,cpp}): the patch grid is a *batch dimension*.
All N patches of a scale advance together through masked Gauss-Newton
iterations inside one `lax.while_loop`; per-patch early stopping becomes an
`active` mask that reproduces the reference's convergence predicate exactly
(reference: patch.cpp:287-293, including min_iter gating). Note the reference
presets use min_iter == max_iter (run_dense.cpp:240-268), so the masked
fixed-trip loop wastes no work there.

Hardware mapping (the two decisions that make this fast on TPU):

1. **Patches live on the lane axis.** All per-patch pixel state is laid out
   (D, N) with D = psz*psz*C on sublanes and the patch index N on lanes, so
   the (8,128) VPU tiling is dense. The naive (N, P, P, C) layout pads its
   trailing (P, C) dims to (8,128) — a >100x memory blowup per elementwise
   op that dominates runtime.

2. **Bilinear patch extraction is MXU matmuls, not gathers.** Per GN
   iteration every patch samples a (P+1)^2 window at a float position
   (patch.cpp:346-413). Per-patch dynamic-slice gathers serialize on TPU.
   Instead: precompute psz+1 column-shifted copies of the level image once
   per level; each iteration builds an exact 0/1 one-hot (Wp, N) selecting
   each patch's anchor column and contracts the shifted images against it on
   the MXU (batched over frame pairs). Window-row selection + both bilinear
   lerps then run as one batch-blocked Pallas kernel (XLA materializes the
   equivalent one-hot row reduce; a row gather would serialize). The one-hot
   is exact in bfloat16; the image is split hi/lo into two bfloat16 planes
   whose f32-accumulated products reconstruct float32 values to ~1e-3
   absolute (on a 0..255 intensity scale), far inside the parity budget.

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

from functools import lru_cache, partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from of_dis_tpu.params import (COST_HUBER, COST_L1, COST_L2, DISParams,
                               LevelSpec, MINERRVAL, NORMOUTLIER, grid_points)


class PatchTemplates(NamedTuple):
    """Per-level static patch data (outputs of InitializeGrid).

    D = psz*psz*noc flattened patch pixels (row-major j, i, c); N patches on
    the trailing (lane) axis."""
    tmpl: jnp.ndarray   # (D, N) template patch (mean-normalized if patnorm)
    tdx: jnp.ndarray    # (D, N) template x-gradient (never normalized)
    tdy: jnp.ndarray    # (D, N) template y-gradient
    hes: jnp.ndarray    # (3, N) [H00, H01, H11] (flow) or (1, N) (depth)


class PatchResult(NamedTuple):
    """Per-level optimization result (inputs to densification)."""
    p: jnp.ndarray        # (N, nop) final displacement parameters
    pt: jnp.ndarray       # (N, 2) final patch position (pt_ref + displacement)
    # (P, P, N) per-pixel splat-weight DENOMINATORS sum_c max(w_c, MINERRVAL)
    # (patchgrid.cpp:253-260 — the clamp precedes the channel sum; densify
    # divides). Folding the clamp-sum into the solver backends shrinks the
    # RGB kernels' pweight carry and output 3x; the transform is
    # idempotent (every value >= MINERRVAL), so downstream math is
    # bit-identical to clamping raw weights there.
    pweight: jnp.ndarray
    # () diagnostic: the number of Gauss-Newton iterations that ran with at
    # least one active patch — the XLA while-loop's trip count. The fused /
    # tiled Pallas kernels carry the same counter through their masked
    # fixed-trip loops (max over blocks/tiles), so the value is
    # backend-identical.
    iters: jnp.ndarray


def grid_ref_points(spec: LevelSpec) -> jnp.ndarray:
    """(N, 2) float32 patch reference positions, column-major patch order
    i = x*noph + y (reference: patchgrid.cpp:61-75)."""
    xs, ys = grid_points(spec)
    return jnp.asarray(np.stack([xs, ys], axis=1), dtype=jnp.float32)


@lru_cache(maxsize=64)
def _template_sel_mats(spec: LevelSpec, psz: int):
    """Constant 0/1 selection matrices for the matmul template extraction:
    C_all ((psz*nopw), Wp) picks columns xbase + x*steps + i (i-major rows)
    and R_all (psz, noph, Hp) picks rows ybase + y*steps + j per j."""
    lb = -psz // 2
    ybase = spec.offseth + lb + spec.pad
    xbase = spec.offsetw + lb + spec.pad
    hp = spec.padded_height
    wp = spec.padded_width
    # Cached as uint8 (densified to f32 at trace time in _templates_mm):
    # the dense f32 forms are ~10-15 MB per fine-level entry and the cache
    # would retain up to maxsize of them for the life of the process.
    c_all = np.zeros((psz * spec.nopw, wp), np.uint8)
    for i in range(psz):
        for x in range(spec.nopw):
            c_all[i * spec.nopw + x, xbase + x * spec.steps + i] = 1
    r_all = np.zeros((psz, spec.noph, hp), np.uint8)
    for j in range(psz):
        for y in range(spec.noph):
            r_all[j, y, ybase + y * spec.steps + j] = 1
    return c_all, r_all


def _templates_mm(spec: LevelSpec, psz: int, field: jnp.ndarray):
    """(C, Hp, Wp) -> (D, N) template window extraction as two constant
    0/1-matrix contractions (HIGHEST precision: exact selection).

    The im2col slab-stack form costs ~0.5 ms/pair/field at op-3 fine
    levels: XLA picks T(1,128) layouts for the 7-D stacked slices and
    copies at ~70 GB/s. Two MXU dots plus reshapes write the same (D, N)
    at full speed. Row/patch orders match the slab form exactly:
    D = (j, i, c), N = (x, y) column-major."""
    c, hp, wp = field.shape
    c_all, r_all = _template_sel_mats(spec, psz)
    nopw, noph = spec.nopw, spec.noph
    hi = jax.lax.Precision.HIGHEST
    imt = jnp.swapaxes(field, 1, 2)                      # (c, Wp, Hp)
    u = jnp.einsum("mw,cwh->cmh", jnp.asarray(c_all, jnp.float32), imt,
                   precision=hi)
    u = u.reshape(c, psz, nopw, hp)
    u = jnp.transpose(u, (1, 0, 2, 3)).reshape(psz * c * nopw, hp)
    g = jnp.einsum("mh,jyh->jmy", u, jnp.asarray(r_all, jnp.float32),
                   precision=hi)
    # (j, (i, c, x), y) -> (D = (j, i, c), N = (x, y))
    g = g.reshape(psz, psz * c, nopw, noph)
    return g.reshape(psz * psz * c, nopw * noph)


def extract_templates(spec: LevelSpec, params: DISParams, im: jnp.ndarray,
                      dx: jnp.ndarray, dy: jnp.ndarray) -> PatchTemplates:
    """InitializeGrid: extract template patches + gradients, build Hessians.

    im/dx/dy: (C, Hp, Wp) padded level images. Reference: patch.cpp:55-86.
    """
    psz = params.p_samp_s

    def gather(imgs):
        return _templates_mm(spec, psz, imgs)

    tmpl = gather(im)
    tdx = gather(dx)
    tdy = gather(dy)
    if params.patnorm > 0:
        tmpl = tmpl - tmpl.mean(axis=0, keepdims=True)

    h00 = jnp.sum(tdx * tdx, axis=0)
    if params.nop == 2:
        h01 = jnp.sum(tdx * tdy, axis=0)
        h11 = jnp.sum(tdy * tdy, axis=0)
        det = h00 * h11 - h01 * h01
        guard = (det == 0.0).astype(h00.dtype) * 1e-10
        hes = jnp.stack([h00 + guard, h01, h11 + guard], axis=0)
    else:
        guard = (h00 == 0.0).astype(h00.dtype) * 1e-10
        hes = (h00 + guard)[None, :]
    return PatchTemplates(tmpl, tdx, tdy, hes)


def _batched_templates(spec: LevelSpec, params: DISParams,
                       src) -> PatchTemplates:
    """extract_templates over a batch of source fields (im, dx, dy),
    each (B, C, Hp, Wp)."""
    im, dx, dy = src
    return jax.vmap(lambda a, gx, gy: extract_templates(
        spec, params, a, gx, gy))(im, dx, dy)


def _extract_terms() -> int:
    """bf16 term count of the plane split used by every MXU extraction
    path: 2 (hi/lo, ~16-bit mantissa — comfortably inside the 1% EPE
    budget) by default; OF_DIS_TPU_EXACT_EXTRACT=1 switches to 3 terms
    (hi/mid/lo), whose reconstruction is f32-exact to ~1 ulp, for
    accuracy-critical runs (reference exactness: patch.cpp:346-413).
    Read at trace time."""
    import os
    return 3 if os.environ.get("OF_DIS_TPU_EXACT_EXTRACT") else 2


def _split_bf16(cat: jnp.ndarray):
    """Split an f32 array into _extract_terms() bf16 planes whose f32 sum
    reconstructs it (residual cascade)."""
    terms = []
    resid = cat
    for _ in range(_extract_terms()):
        t = resid.astype(jnp.bfloat16)
        terms.append(t)
        resid = resid - t.astype(jnp.float32)
    return terms


def _shifted_planes(im: jnp.ndarray, psz: int):
    """Precompute column-shifted bf16 term planes of the padded level image.

    im: (C, Hp, Wp). Returns a tuple of ((psz+1)*C*Hp, Wp) bf16 planes
    (hi/lo, or hi/mid/lo in exact mode): row block s holds im[c, y, x+s]
    (zero beyond the right edge; those columns are never selected because
    patch anchors are bounds-checked)."""
    c, hp, wp = im.shape
    w1 = psz + 1
    # concatenate flat (C*Hp, Wp) blocks instead of stack+reshape: the
    # stacked 4-D form makes XLA pick a batch-minor layout and relayout-copy
    cat = jnp.concatenate(
        [jnp.pad(im[:, :, s:], ((0, 0), (0, 0), (0, s))).reshape(c * hp, wp)
         for s in range(w1)], axis=0)                  # (W1*C*Hp, Wp)
    return tuple(_split_bf16(cat))


# HBM budget for the XLA fallback's per-iteration extraction tensor;
# above it the extraction is chunked over patches (op-4 finest levels)
_XLA_T_BUDGET = 1 << 31


def _use_pallas_bilerp() -> bool:
    import os
    if os.environ.get("OF_DIS_TPU_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _tiled_cm(two_stage: bool, noc: int) -> bool:
    """Channel-major (c, i, j) element order for the tiled kernel.

    Mandatory for multi-channel two-stage tiles (the per-channel staging
    is what fits noc=3 in VMEM). For noc == 1 the same order costs
    nothing (the extraction dot is identical — only the final row
    slicing changes) and buys the fully vectorized bilerp: one y-lerp +
    one x-lerp FMA pair over (w1, psz, nb) instead of psz small per-j
    ops — measured on the per-trip-cost-bound op-4 level (PERF.md).
    OF_DIS_TPU_TILED_CM1=0 restores the legacy (j, i) order for A/B."""
    import os
    if not two_stage:
        return False
    if noc > 1:
        return True
    return os.environ.get("OF_DIS_TPU_TILED_CM1", "1") != "0"


def _use_extract_cache() -> bool:
    """Cross-iteration extraction-row caching in the fused GN kernels
    (diagnostic escape hatch: OF_DIS_TPU_NO_EXTRACT_CACHE=1 disables)."""
    import os
    return not os.environ.get("OF_DIS_TPU_NO_EXTRACT_CACHE")


def _bilerp_select_pure(t, sy, ry, rx, psz, c, hp):
    """Row selection + bilinear lerps after the column one-hot matmul.

    t (B, w1, c, hp, n); sy/ry/rx (B, n). Returns (B, D, n), D=(j,i,c).
    Row selection + the y-lerp fuse as a one-hot contraction over rows
    (a take_along_axis gather here costs ~15x the MXU matmul on TPU: the
    per-lane sublane gather serializes).
    dy[j, y, n] = ry*[y==sy+j+1] + (1-ry)*[y==sy+j]
    """
    b, w1, _, _, n = t.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, psz, hp, n), 2)
    jj = jax.lax.broadcasted_iota(jnp.int32, (b, psz, hp, n), 1)
    tgt = sy[:, None, None, :] + jj
    ryb = ry[:, None, None, :]
    dy = ((rows == tgt + 1).astype(jnp.float32) * ryb
          + (rows == tgt).astype(jnp.float32) * (1.0 - ryb))
    # gy[b, s, c, j, n] = sum_y t[b, s, c, y, n] * dy[b, j, y, n]
    gy = (t[:, :, :, None, :, :] * dy[:, None, None, :, :, :]).sum(axis=4)
    # x-bilinear across the shift axis (patch.cpp:361-375)
    rxb = rx[:, None, None, None, :]
    px = rxb * gy[:, 1:] + (1.0 - rxb) * gy[:, :-1]   # (B, P_i, C, P_j, N)
    patch = jnp.transpose(px, (0, 3, 1, 2, 4))        # (B, P_j, P_i, C, N)
    return patch.reshape(b, psz * psz * c, n)


def _bilerp_block(b: int, w1: int, c: int, hp: int, n: int):
    """Largest batch block whose t-slab fits the VMEM budget, or None when
    even a single pair exceeds it (large op-3/4 levels) — the pure path is
    used then. The slab is counted ~3x: Pallas double-buffers the input
    block across grid steps and the kernel's tv_*dyj product materializes
    a slab-sized temporary (measured 18.1M peak at a 6.3M slab — the old
    6M single-slab check OOMed the 16M VMEM stack on the per-tile fix-up's
    op-4 L0 geometry)."""
    cap = _vmem_cap(12 * 1024 * 1024)
    for cand in (8, 4, 2, 1):
        if b % cand == 0 and 3 * cand * w1 * c * hp * n * 4 < cap:
            return cand
    return None


def _bilerp_select_pallas(t, sy, ry, rx, psz, c, hp):
    """Fused Pallas version of _bilerp_select_pure: the dense one-hot
    row-reduce materializes a (B, w1, c, psz, hp, n) product in XLA (~half
    of each Gauss-Newton iteration's time); in VMEM it fuses away."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, w1, _, _, n = t.shape
    bb = _bilerp_block(b, w1, c, hp, n)

    def kernel(t_ref, sy_ref, ry_ref, rx_ref, out_ref):
        tv_ = t_ref[:]                              # (bb, w1, c, hp, n)
        sy_ = sy_ref[:][:, 0, :]                    # (bb, n)
        ry_ = ry_ref[:][:, :, None, :]              # (bb, 1, 1, n)
        rx_ = rx_ref[:][:, :, None, :]
        rows = jax.lax.broadcasted_iota(jnp.int32, (bb, hp, n), 1)
        for j in range(psz):
            tgt = sy_[:, None, :] + j               # (bb, 1->hp, n)
            dyj = ((rows == tgt + 1).astype(jnp.float32) * ry_[:, 0]
                   + (rows == tgt).astype(jnp.float32) * (1.0 - ry_[:, 0]))
            gy = (tv_ * dyj[:, None, None, :, :]).sum(axis=3)  # (bb,w1,c,n)
            px = rx_ * gy[:, 1:] + (1.0 - rx_) * gy[:, :-1]    # (bb,P,c,n)
            out_ref[:, j * psz * c:(j + 1) * psz * c, :] = px.reshape(
                bb, psz * c, n)

    blk_t = pl.BlockSpec((bb, w1, c, hp, n), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    # (B, 1, N) so the trailing block dims equal the array dims (a (bb, N)
    # block would violate the (8, 128)-divisibility rule for bb < 8)
    blk_v = pl.BlockSpec((bb, 1, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_o = pl.BlockSpec((bb, psz * psz * c, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b // bb,),
        out_shape=jax.ShapeDtypeStruct((b, psz * psz * c, n), jnp.float32),
        in_specs=[blk_t, blk_v, blk_v, blk_v],
        out_specs=blk_o,
    )(t, sy[:, None, :], ry[:, None, :], rx[:, None, :])


def extract_bilinear_mxu_batched(lhs_planes, pts: jnp.ndarray, psz: int,
                                 pad: int, c: int, hp: int, wp: int,
                                 use_pallas: bool) -> jnp.ndarray:
    """Bilinear patch extraction at float positions via one-hot MXU matmuls.

    lhs_planes: tuple of batched _shifted_planes, each ((B, (psz+1)*C*Hp,
    Wp)) bf16. pts: (B, N, 2) float positions. Returns (B, D, N),
    D = psz*psz*c, pixel order (j, i, c).

    Implements getPatchStaticBil (patch.cpp:346-413): anchor = ceil(pt+1e-5),
    residual vs floor(pt); patch(j,i) = lerp_y(lerp_x of the (P+1)^2 window).
    """
    w1 = psz + 1
    b, n = pts.shape[0], pts.shape[1]
    pos_c = jnp.ceil(pts + 1e-5).astype(jnp.int32)     # (B, N, 2)
    resid = pts - jnp.floor(pts)                       # (B, N, 2)
    rx = resid[:, :, 0]
    ry = resid[:, :, 1]
    sx = pos_c[:, :, 0] - psz // 2 - 1 + pad           # (B, N) anchor column
    sy = pos_c[:, :, 1] - psz // 2 - 1 + pad           # (B, N) anchor row

    # exact 0/1 one-hot over columns, bf16 (values representable exactly)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, wp, n), 1)
    onehot = (cols == sx[:, None, :]).astype(jnp.bfloat16)     # (B, Wp, N)

    # MXU: T[b, s, ch, y, n] = im[b, ch, y, x = sx_n + s]
    dn = (((2,), (1,)), ((0,), (0,)))
    t = sum(jax.lax.dot_general(p, onehot, dn,
                                preferred_element_type=jnp.float32)
            for p in lhs_planes)
    t = t.reshape(b, w1, c, hp, n)
    if use_pallas and _bilerp_block(b, w1, c, hp, n) is not None:
        return _bilerp_select_pallas(t, sy, ry, rx, psz, c, hp)
    return _bilerp_select_pure(t, sy, ry, rx, psz, c, hp)


def loss_error_image(diff: jnp.ndarray, costfct: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Residual transform + weights per cost function (patch.cpp:221-273).

    diff = extracted_patch - template. Returns (pdiff, pweight).
    """
    if costfct == COST_L2:
        return diff, jnp.abs(diff)
    # sign transfer as where() (value-equal to copysign for w >= 0; w == 0
    # whenever diff == +-0) — jnp.copysign has no Mosaic lowering
    if costfct == COST_L1:
        w = jnp.sqrt(jnp.abs(diff))
        return jnp.where(diff >= 0.0, w, -w), w
    if costfct == COST_HUBER:
        bsq = NORMOUTLIER * NORMOUTLIER
        w = jnp.sqrt(2.0 * bsq * (jnp.sqrt(1.0 + diff * diff / bsq) - 1.0))
        return jnp.where(diff >= 0.0, w, -w), w
    # costfct outside {0,1,2}: the reference computes nothing (patch.cpp:228-272
    # falls through), leaving pdiff/pweight stale; we define it as zeros.
    return jnp.zeros_like(diff), jnp.zeros_like(diff)


def _pw_dense(pw: jnp.ndarray, psz: int, noc: int) -> jnp.ndarray:
    """Raw per-element cost weights (..., D, N) with D = (j, i, c) -> the
    densify splat-weight denominator (..., psz*psz, N): sum_c max(w_c,
    MINERRVAL) per pixel (patchgrid.cpp:253-260). Runs inside the kernels
    (leading-dim reshape + sublane reduce, both Mosaic-legal)."""
    if noc == 1:
        return jnp.maximum(pw, MINERRVAL)
    shp = pw.shape
    p3 = pw.reshape(shp[:-2] + (psz * psz, noc, shp[-1]))
    return jnp.sum(jnp.maximum(p3, MINERRVAL), axis=-2)


def _solve_step(hes: jnp.ndarray, rhs: jnp.ndarray, nop: int) -> jnp.ndarray:
    """Closed-form SPD solve of H dp = rhs (Eigen .llt().solve, patch.cpp:182).

    hes: (B, 3, N) or (B, 1, N); rhs: (B, nop, N). Returns (B, nop, N)."""
    if nop == 2:
        h00, h01, h11 = hes[:, 0], hes[:, 1], hes[:, 2]
        det = h00 * h11 - h01 * h01
        dp0 = (h11 * rhs[:, 0] - h01 * rhs[:, 1]) / det
        dp1 = (h00 * rhs[:, 1] - h01 * rhs[:, 0]) / det
        return jnp.stack([dp0, dp1], axis=1)
    return rhs / hes


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _masked_gn_loop(max_iter: int, body, carry0, active_idx: int = 3):
    """Run the masked GN iteration `body` with block-level early exit.

    Semantically identical to `lax.fori_loop(0, max_iter, body, carry0)`:
    every carry update in `body` is gated on the per-patch active mask
    (carry index `active_idx`, a 0/1 f32), patches never reactivate, and
    the iters diagnostic adds max(active)==0 on dead trips — so an
    iteration entered with no active patch is an identity on every
    observed output and the while_loop may stop there. The only non-gated
    carry slot is the extraction cache, which is unobserved once its
    patch is inactive. Matters most at op-4 (max_iter=128, typical
    convergence ~10-20): the fixed-trip form burns >100 dead iterations
    per block."""
    def cond(state):
        i, carry = state
        return (i < max_iter) & (jnp.max(carry[active_idx]) > 0.5)

    def wbody(state):
        i, carry = state
        return i + 1, body(i, carry)

    return jax.lax.while_loop(cond, wbody, (jnp.int32(0), carry0))[1]


def _vmem_cap(default_bytes: int) -> int:
    """Kernel VMEM-budget caps, scaled by OF_DIS_TPU_VMEM_SCALE (a float;
    e.g. 1.5 on TPU generations with more than v5e's 16MB/core VMEM, <1 to
    force smaller blocks). The defaults are empirically calibrated on v5e —
    Mosaic keeps roughly 2x the naive live-set estimate."""
    import os
    scale = float(os.environ.get("OF_DIS_TPU_VMEM_SCALE", "1.0"))
    return int(default_bytes * scale)


def _banded_planes_raw(im: jnp.ndarray, hpb: int):
    """Raw (un-shifted) bf16 term planes for the fused GN kernel.

    Rows are zero-padded to hpb (see _gn_windows) so that every 8-row band
    index bi = sy // 8 has a full band window [8*bi, 8*bi + WB) inside the
    plane (the padding rows are never selected: window rows are
    bounds-checked against the real image extent). Returns (C*Hpb, nt*Wp):
    term planes stacked along the contraction axis — with the one-hot
    duplicated to (nterms*Wp, N), sum_t plane_t@oh becomes ONE MXU dot.

    The (psz+1) column-shifted copies the extraction dot needs are built
    INSIDE the kernel from this raw plane (like the tiled kernel's window
    DMA): materializing them here cost w1 x the HBM lhs traffic plus the
    f32 shifted intermediate (~2 ms of plane-prep fusions per 384-pair
    op-2 batch). Shifting commutes with the per-element bf16 term split,
    so the in-VMEM copies are bit-identical to the old precomputed form."""
    c, hp, wp = im.shape
    imp = jnp.pad(im, ((0, 0), (0, hpb - hp), (0, 0))).reshape(c * hpb, wp)
    return jnp.concatenate(_split_bf16(imp), axis=1)   # (C*Hpb, nt*Wp)


def _banded_planes_raw_i8(im: jnp.ndarray, hpb: int, lv: int):
    """Raw int8 hi/lo planes for the fused GN kernel's i8 extraction path.

    u8-sourced level-lv values are exact multiples of 4^-lv in [0, 255]
    (box means of 4^lv bytes), so u = im * 4^lv is an exact integer in
    [0, 65535] whenever 8 + 2*lv <= 16 (lv <= 4). Split u into two i8
    channel planes hi = (u >> 8) - 128, lo = (u & 255) - 128, stacked as
    2C channels; the kernel contracts them with an i8 one-hot in ONE
    i8 x i8 -> i32 MXU dot (1.5-1.56x the bf16 term-summed dot's rate,
    tools/bench_i8_dot.py / bench_gn_stages.py C1) and reconstructs
    u = 256*hi + lo + 32896 exactly in i32 only after band alignment,
    so the f32 values the GN math sees are bit-identical to the bf16
    hi/lo path's. Returns (2*C*hpb, Wp) int8."""
    c, hp, wp = im.shape
    u = jnp.round(im * float(4 ** lv)).astype(jnp.int32)
    hi = jax.lax.shift_right_logical(u, 8) - 128
    lo = jnp.bitwise_and(u, 255) - 128
    cat = jnp.concatenate([hi, lo], axis=0).astype(jnp.int8)  # (2C, Hp, Wp)
    cat = jnp.pad(cat, ((0, 0), (0, hpb - hp), (0, 0)))
    return cat.reshape(2 * c * hpb, wp)


def _gn_windows(psz: int, hp: int):
    """(band window rows WB, padded plane rows hpb, band count) for the
    fused kernel's two-stage row selection. WB covers any (psz+1)-row
    window starting at an in-band offset s3 < 8."""
    wb = _round_up(psz + 8, 8)
    hpb = _round_up(hp, 8) + wb - 8
    nbands = (hpb - wb) // 8 + 1
    return wb, hpb, nbands


def _pick_gn_bb(b: int, w1: int, c: int, hpb: int, wp: int, d: int, n: int,
                use_cache: bool = True, i8: bool = False):
    """Batch block for the fused GN kernel, or None when one pair's working
    set already exceeds the VMEM budget. The extraction-cache carry rows
    only count when the kernel will actually carry them (long loops)."""
    wb = _round_up(w1 - 1 + 8, 8)
    nt = _extract_terms()
    if i8:
        per = (w1 * 2 * c * hpb * wp      # i8 shifted-plane scratch
               + 2 * 2 * c * hpb * wp     # raw i8 plane block (dbl-buffered)
               + 3 * w1 * c * hpb * n * 4  # i32 t (2c rows) + transients
               + (w1 * c * wb * n * 4 if use_cache else 0)
               + (5 * d + 2 * (d // c)) * n * 4)
    else:
        per = (nt * w1 * c * hpb * wp * 2  # in-VMEM shifted-plane scratch
               + 2 * nt * c * hpb * wp * 2  # raw plane blk (double-buffered)
               + 2 * w1 * c * hpb * n * 4  # t + shifted copies (transient)
               + (w1 * c * wb * n * 4 if use_cache else 0)  # cached carry
               # tmpl/tdx/tdy + transients (d-sized) + pweight carry/outputs
               # (channel-summed psz*psz = d//c rows, see _pw_dense)
               + (5 * d + 2 * (d // c)) * n * 4)
    cap = _vmem_cap(10 * 1024 * 1024)
    for cand in (8, 4, 2, 1):
        if b % cand == 0 and cand * per < cap:
            return cand
    return None


def _pick_gn_nb(w1: int, c: int, hpb: int, wp: int, d: int, n: int,
                use_cache: bool = True, i8: bool = False):
    """Patch block for the N-blocked fused kernel (large op-3/4 levels where
    even a single pair's full patch set exceeds VMEM): largest multiple of
    128 whose per-program working set fits alongside the shared plane
    block, or None when the planes alone bust the budget. The cap is higher
    than _pick_gn_bb's: the plane block is fetched once per pair (its index
    ignores the patch-block grid axis) so it is not double-buffered
    (op-3 L1, estimated 11.4MB at nb=128, compiles and runs)."""
    cap = _vmem_cap(12 * 1024 * 1024 + 512 * 1024)
    # shifted-plane scratch + the raw plane block it is built from
    if i8:
        planes = w1 * 2 * c * hpb * wp + 2 * c * hpb * wp
    else:
        planes = (_extract_terms() * w1 * c * hpb * wp * 2
                  + _extract_terms() * c * hpb * wp * 2)
    wb = _round_up(w1 - 1 + 8, 8)
    if planes >= cap:
        return None
    for nb in (1024, 512, 384, 256, 128):
        per = (planes
               + (3 if i8 else 2) * w1 * c * hpb * nb * 4
               + (w1 * c * wb * nb * 4 if use_cache else 0)
               + (5 * d + 2 * (d // c)) * nb * 4)
        if per < cap:
            return nb
    return None


def _gn_fused_pallas(spec: LevelSpec, params: DISParams, lhs,
                     tpl: PatchTemplates, p_init_t: jnp.ndarray,
                     pt_ref_t: jnp.ndarray, bb: int, hpb: int,
                     nb: int = 0, gpk: int = 1):
    """The whole per-level Gauss-Newton loop as one fused Pallas kernel.

    Replicates the XLA while-loop body of optimize_level_batched exactly
    (the masked fixed-trip fori is semantically identical: the per-patch
    `active` mask governs all state updates; the while's global any() exit
    is only a wall-clock shortcut). Everything stays in VMEM per program:

      - one-hot column extraction runs as one bf16 MXU dot per pair per
        iteration over K-stacked hi|lo planes (the XLA path's t tensor,
        (B, w1*c*hp, N) f32 per iteration, never touches HBM — it was the
        dominant HBM traffic of the whole pipeline),
      - row selection is two-stage: an 8-row-granular band select (nbands
        masked adds) followed by a 3-bit in-band roll align, instead of a
        dense one-hot reduce over all hp rows,
      - the GN math (steepest-descent projections, closed-form solve,
        bounds/outlier resets, convergence predicate of patch.cpp:287-293)
        runs on (bb, D, N) blocks.

    lhs: (B, c*hpb, nt*wp) RAW bf16 banded term planes (_banded_planes_raw);
    the w1 column-shifted copies the extraction dot contracts against are
    built once per program into a VMEM scratch (bit-identical to the old
    HBM-precomputed form; 1/w1 the lhs HBM traffic). tpl fields (B, D, N);
    p_init_t (B, nop, N); pt_ref_t (1, 2, N).

    gpk > 1 = pair packing for small-grid coarse levels: gpk frame pairs
    share one program's lane axis (N = gpk*n_orig lanes, their planes
    stacked as gpk column-blocks of lhs's contraction axis). A level with
    n=32 patches fills only a quarter of each (8,128) vreg — at op-2's
    coarsest level that made the kernel instruction-bound (1.48ms per
    384-pair batch for 2% of the pipeline's work). The one-hot gains a
    per-pair block mask (exact 0/1, so the f32 dot accumulation is
    bit-identical to separate per-pair dots); everything else in the
    kernel is lane-parallel already.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    psz, pad, nop, c = params.p_samp_s, spec.pad, params.nop, params.noc
    w1 = psz + 1
    wb, _, nbands = _gn_windows(psz, spec.padded_height)
    b, chpb, wp2 = lhs.shape
    m_rows = w1 * chpb
    # int8 extraction path (u8-sourced pyramids, lv <= 4): lhs is the
    # (2c-channel hi/lo) i8 form of _banded_planes_raw_i8 — ONE
    # i8 x one-hot -> i32 dot replaces the bf16 term-summed dot, and the
    # exact 256*hi + lo + 32896 reconstruction runs after band alignment
    # on the small (w1, 2c, wb, n) window (bit-identical f32 values)
    i8 = lhs.dtype == jnp.int8
    assert not (i8 and gpk > 1), "i8 extraction is gpk==1 only"
    nterms = 1 if i8 else wp2 // spec.padded_width  # 2 (3 in exact mode)
    wp = wp2 // nterms
    cdot = 2 * c if i8 else c              # channel rows per shift block
    inv4 = 1.0 / float(4 ** spec.level)
    d = tpl.tmpl.shape[1]
    psz2 = psz * psz                       # pweight output rows (channel-summed)
    n_tot = tpl.tmpl.shape[2]
    n = nb or n_tot      # patch-block width (the whole grid when nb == 0)
    nh = tpl.hes.shape[1]
    novals = float(params.novals)

    # cross-iteration extraction caching pays for its cond + carry only on
    # long loops (whole-block skips need EVERY active patch cell-stable;
    # measured a ~6% op-2 loss at 12 iterations, large wins at 128)
    use_cache = _use_extract_cache() and params.max_iter >= 32

    def kernel(lh_ref, tm_ref, tx_ref, ty_ref, he_ref, p0_ref,
               pr_ref, po_ref, pw_ref, it_ref, sc_ref):
        # build the w1 column-shifted plane copies in VMEM from the raw
        # block: row-block s of sc holds plane[:, x+s] (zeros past the
        # right edge of each wp-wide term block — never selected, patch
        # anchors are bounds-checked). On the N-blocked path the raw block
        # is constant across the patch-block grid, so build once.
        def build_shifts():
            for k in range(lh_ref.shape[0]):
                for t in range(nterms):
                    for s in range(w1):
                        blk = lh_ref[k, :, t * wp + s:(t + 1) * wp]
                        if s:
                            blk = jnp.concatenate(
                                [blk, jnp.zeros((chpb, s), lh_ref.dtype)],
                                axis=1)
                        sc_ref[k, s * chpb:(s + 1) * chpb,
                               t * wp:(t + 1) * wp] = blk

        if nb:
            @pl.when(pl.program_id(0) == 0)
            def _():
                build_shifts()
        else:
            build_shifts()

        tmpl = tm_ref[:]
        tdx = tx_ref[:]
        tdy = ty_ref[:]
        hes = he_ref[:]
        p_init = p0_ref[:]
        ptr = pr_ref[:]                                  # (1, 2, n)

        def to_pt(p):
            if nop == 2:
                return ptr + p
            return jnp.concatenate(
                [ptr[:, 0:1] + p,
                 jnp.broadcast_to(ptr[:, 1:2], p.shape)], axis=1)

        def oob(pt):
            return ((pt[:, 0] < spec.tmp_lb) | (pt[:, 1] < spec.tmp_lb)
                    | (pt[:, 0] > spec.tmp_ubw) | (pt[:, 1] > spec.tmp_ubh))

        def select_rows(sx, sy):
            """(bb, w1c, wb, n) position-aligned window rows: the one-hot
            extraction dot + band/sub-band alignment per pair. Pure
            function of the integer anchors — cached across GN iterations
            once patches stop crossing pixel cells."""
            outs = []
            for k in range(bb):
                # multi-hot over the K-stacked term planes: one MXU dot
                # computes sum_t plane_t@oh. Per-pair values are sliced
                # rank-2 (1, n) — rank-1 (n,) vectors cost Mosaic an
                # implicit-dim layout (measured 24% on the tiled kernel).
                # The per-term masks are identical (row r of term t is hot
                # iff r - t*wp == sx), so build one (wp, n) compare and
                # stack it instead of nterms compares over (wp2, n).
                # Pair-packed levels additionally mask each pair's
                # column-block to its own lanes (blocks are g-major,
                # t-inner, matching the packed lhs layout).
                cols = jax.lax.broadcasted_iota(jnp.int32, (wp, n), 0)
                sxk = sx[k:k + 1]
                if i8:
                    oh = (cols == sxk).astype(jnp.int8)
                    t = jnp.dot(sc_ref[k], oh,
                                preferred_element_type=jnp.int32)
                else:
                    m1 = (cols == sxk).astype(jnp.bfloat16)
                    if gpk == 1:
                        oh = jnp.concatenate([m1] * nterms, axis=0)
                    else:
                        lane_pair = jax.lax.broadcasted_iota(
                            jnp.int32, (wp, n), 1) // (n // gpk)
                        blocks = []
                        for g in range(gpk):
                            mg = jnp.where(lane_pair == g, m1,
                                           jnp.bfloat16(0.0))
                            blocks.extend([mg] * (nterms // gpk))
                        oh = jnp.concatenate(blocks, axis=0)
                    t = jnp.dot(sc_ref[k], oh,
                                preferred_element_type=jnp.float32)
                t = t.reshape(w1 * cdot, hpb, n)
                syk = sy[k:k + 1]                        # (1, n)
                bi = jax.lax.shift_right_logical(syk, 3)
                tb = jnp.zeros((w1 * cdot, wb, n), t.dtype)
                for band in range(nbands):
                    m = (bi == band)[None]
                    tb = tb + jnp.where(
                        m, t[:, 8 * band:8 * band + wb, :],
                        t.dtype.type(0))
                s3 = jnp.bitwise_and(syk, 7)
                a = tb
                for bit in range(3):
                    amt = 1 << bit
                    rolled = pltpu.roll(a, (wb - amt) % wb, 1)
                    m = (jnp.bitwise_and(jax.lax.shift_right_logical(
                        s3, bit), 1) == 1)[None]
                    a = jnp.where(m, rolled, a)
                # a[:, j, :] == t[:, sy + j, :] for j in 0..psz
                if i8:
                    # exact i32 reconstruction on the aligned window only
                    a4 = a.reshape(w1, 2, c, wb, n)
                    ui = a4[:, 0] * 256 + a4[:, 1] + 32896
                    a = (ui.astype(jnp.float32) * inv4).reshape(
                        w1 * c, wb, n)
                outs.append(a)
            return jnp.stack(outs, axis=0)               # (bb, w1c, wb, n)

        def compute_err(pt, active, prev):
            """prev = (rows cache, integer anchors) or None; when no
            ACTIVE patch moved to a different integer cell the extraction
            dot + alignment are skipped and the cached rows are reused
            (stale rows of inactive patches are masked by the
            active-gated carry update)."""
            pos_c = jnp.ceil(pt + 1e-5).astype(jnp.int32)
            resid = pt - jnp.floor(pt)
            sx = pos_c[:, 0] - psz // 2 - 1 + pad        # (bb, n)
            sy = pos_c[:, 1] - psz // 2 - 1 + pad
            rx = resid[:, 0]
            ry = resid[:, 1]
            sxy = jnp.stack([sx, sy], axis=1)            # (bb, 2, n)
            if prev is None or not use_cache:
                av = select_rows(sx, sy)
            else:
                a_prev, sxyp = prev
                same = jnp.all((~active[:, None, :]) | (sxy == sxyp))
                av = jax.lax.cond(same, lambda _: a_prev,
                                  lambda _: select_rows(sx, sy), None)
            outs = []
            for k in range(bb):
                a = av[k]
                ryk = ry[k:k + 1]                             # (1, n)
                rxk = rx[k:k + 1][None]                       # (1, 1, n)
                rows = [a[:, j, :] for j in range(psz + 1)]   # (w1*c, n)
                parts = []
                for j in range(psz):
                    wyj = (1.0 - ryk) * rows[j] + ryk * rows[j + 1]
                    wyj = wyj.reshape(w1, c, n)
                    pxj = (1.0 - rxk) * wyj[:psz] + rxk * wyj[1:]
                    parts.append(pxj.reshape(psz * c, n))
                outs.append(jnp.concatenate(parts, axis=0))   # (D, n)
            patch = jnp.stack(outs, axis=0)                   # (bb, D, n)
            if params.patnorm > 0:
                patch = patch - patch.mean(axis=1, keepdims=True)
            pdiff, pweight = loss_error_image(patch - tmpl, params.costfct)
            mares = jnp.sum(pweight, axis=1) / novals
            # carry the (nop, n) steepest-descent projection instead of the
            # (D, n) pdiff it contracts from: the per-lane active mask
            # commutes with the within-lane contraction (bit-exact), saving
            # a (D, n) masked select per iteration + D*n*4 carry bytes.
            # pweight: multi-channel is carried pre-clamp-summed (psz*psz,
            # n) — see PatchResult — while noc==1 defers the (commuting)
            # clamp to the output write, off the iteration loop
            pwd = pweight if c == 1 else _pw_dense(pweight, psz, c)
            return (rhs_of(pdiff), pwd, mares,
                    ((av, sxy) if use_cache else None))

        def rhs_of(pd):
            r0 = jnp.sum(tdx * pd, axis=1)
            if nop == 2:
                return jnp.stack([r0, jnp.sum(tdy * pd, axis=1)], axis=1)
            return r0[:, None, :]

        pt0 = to_pt(p_init)
        init_oob = oob(pt0)
        pt0_safe = jnp.where(init_oob[:, None, :],
                             jnp.broadcast_to(ptr, pt0.shape), pt0)
        all_on = jnp.ones((bb, n), jnp.bool_)
        rhs0, pweight0, mares0, cache0 = compute_err(pt0_safe, all_on,
                                                     None)
        _, tmpl_pw = loss_error_image(tmpl, params.costfct)
        m0 = init_oob[:, None, :]
        # init-OOB patches take the raw template as their pdiff
        # (documented deviation, matching the XLA path)
        rhs0 = jnp.where(m0, rhs_of(tmpl), rhs0)
        pweight0 = jnp.where(
            m0, tmpl_pw if c == 1 else _pw_dense(tmpl_pw, psz, c), pweight0)
        active0 = ((~init_oob) & (params.max_iter > 0)
                   & (mares0 > params.res_thresh))

        def body(i, carry):
            # `active` rides the carry as a 0/1 f32 mask: Mosaic cannot
            # legalize i1 vectors in scf.for operands
            if use_cache:
                (p, rhs, pweight, active_f, mares, dpn_init, itcnt,
                 cache) = carry
            else:
                (p, rhs, pweight, active_f, mares, dpn_init,
                 itcnt) = carry
                cache = None
            active = active_f > 0.5
            # iterations entered with >=1 active patch == the XLA
            # while-loop's trip count (diagnostic)
            itcnt = itcnt + jnp.max(active_f)
            it1 = i + 1
            dp = _solve_step(hes, rhs, nop)
            p_new = p - dp
            if nop == 1:
                if spec.camlr == 0:
                    p_new = jnp.minimum(p_new, 0.0)
                else:
                    p_new = jnp.maximum(p_new, 0.0)
            pt_new = to_pt(p_new)
            moved = jnp.sqrt(jnp.sum((pt_new - pt0) ** 2, axis=1))
            reset = (moved > params.outlierthresh) | oob(pt_new)
            p_new = jnp.where(reset[:, None, :], p_init, p_new)
            pt_new = to_pt(p_new)
            rhs_new, pweight_new, mares_new, cache_new = compute_err(
                pt_new, active, cache)
            dp_sqnorm = jnp.sum(dp * dp, axis=1)
            dpn_init_new = jnp.where(it1 == 1, dp_sqnorm, dpn_init)
            keep = ((it1 < params.max_iter)
                    & (mares_new > params.res_thresh)
                    & ((it1 < params.min_iter)
                       | (dp_sqnorm / dpn_init_new >= params.dp_thresh_sq))
                    & ((it1 < params.min_iter)
                       | (mares_new / mares <= params.dr_thresh)))
            active_new = active & keep & (~reset)

            def sel(new, old):
                if new.ndim == 2:
                    return jnp.where(active, new, old)
                return jnp.where(active[:, None, :], new, old)

            tail = (cache_new,) if use_cache else ()
            return (sel(p_new, p), sel(rhs_new, rhs),
                    sel(pweight_new, pweight),
                    (active & active_new).astype(jnp.float32),
                    sel(mares_new, mares),
                    sel(dpn_init_new, dpn_init), itcnt) + tail

        carry0 = (p_init, rhs0, pweight0, active0.astype(jnp.float32),
                  mares0,
                  jnp.full((bb, n), 1e-10, jnp.float32),
                  jnp.float32(0.0)) + ((cache0,) if use_cache else ())
        out = _masked_gn_loop(params.max_iter, body, carry0)
        po_ref[:] = out[0]
        pw_ref[:] = (jnp.maximum(out[2], MINERRVAL) if c == 1    # deferred
                     else out[2])                                # clamp
        # whole-array SMEM block shared across grid steps (a (1,1) block
        # would violate the (8,128) block-divisibility rule): each program
        # writes its own column
        it_ref[0, pl.program_id(0)] = out[6].astype(jnp.int32)

    if nb:
        # N-blocked path (one pair per program, grid over patch blocks
        # only): the batch axis is a lax.map OUTSIDE the pallas_call, so
        # the big plane block has a constant index across the whole grid
        # and stays single-buffered — a (batch, patch) grid would
        # double-buffer it at the batch transition and bust the VMEM stack
        # (measured 19.6M vs the 16M limit at op-3 L1)
        blk_lhs = pl.BlockSpec((1, chpb, wp2), lambda j: (0, 0, 0),
                               memory_space=pltpu.VMEM)
        blk_d = pl.BlockSpec((1, d, n), lambda j: (0, 0, j),
                             memory_space=pltpu.VMEM)
        blk_pwo = pl.BlockSpec((1, psz2, n), lambda j: (0, 0, j),
                               memory_space=pltpu.VMEM)
        blk_h = pl.BlockSpec((1, nh, n), lambda j: (0, 0, j),
                             memory_space=pltpu.VMEM)
        blk_p = pl.BlockSpec((1, nop, n), lambda j: (0, 0, j),
                             memory_space=pltpu.VMEM)
        blk_ptr = pl.BlockSpec((1, 2, n), lambda j: (0, 0, j),
                               memory_space=pltpu.VMEM)

        blk_it = pl.BlockSpec((1, n_tot // n), lambda j: (0, 0),
                              memory_space=pltpu.SMEM)

        def one(xs):
            l1, tm1, tx1, ty1, he1, p01 = xs
            return pl.pallas_call(
                kernel,
                grid=(n_tot // n,),
                out_shape=(
                    jax.ShapeDtypeStruct((1, nop, n_tot), jnp.float32),
                    jax.ShapeDtypeStruct((1, psz2, n_tot), jnp.float32),
                    jax.ShapeDtypeStruct((1, n_tot // n), jnp.int32)),
                in_specs=[blk_lhs, blk_d, blk_d, blk_d, blk_h, blk_p,
                          blk_ptr],
                out_specs=(blk_p, blk_pwo, blk_it),
                scratch_shapes=[pltpu.VMEM((1, m_rows, wp2),
                                           lhs.dtype)],
            )(l1[None], tm1[None], tx1[None], ty1[None], he1[None],
              p01[None], pt_ref_t)

        p_out, pw_out, it_out = jax.lax.map(
            one, (lhs, tpl.tmpl, tpl.tdx, tpl.tdy, tpl.hes, p_init_t))
        return p_out[:, 0], pw_out[:, 0], jnp.max(it_out)

    # single-block path: grid over batch blocks only
    blk_lhs = pl.BlockSpec((bb, chpb, wp2), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    blk_d = pl.BlockSpec((bb, d, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_pwo = pl.BlockSpec((bb, psz2, n), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    blk_h = pl.BlockSpec((bb, nh, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_p = pl.BlockSpec((bb, nop, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_ptr = pl.BlockSpec((1, 2, n), lambda i: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    blk_it = pl.BlockSpec((1, b // bb), lambda i: (0, 0),
                          memory_space=pltpu.SMEM)
    p_out, pw_out, it_out = pl.pallas_call(
        kernel,
        grid=(b // bb,),
        out_shape=(jax.ShapeDtypeStruct((b, nop, n_tot), jnp.float32),
                   jax.ShapeDtypeStruct((b, psz2, n_tot), jnp.float32),
                   jax.ShapeDtypeStruct((1, b // bb), jnp.int32)),
        in_specs=[blk_lhs, blk_d, blk_d, blk_d, blk_h, blk_p,
                  blk_ptr],
        out_specs=(blk_p, blk_pwo, blk_it),
        scratch_shapes=[pltpu.VMEM((bb, m_rows, wp2), lhs.dtype)],
    )(lhs, tpl.tmpl, tpl.tdx, tpl.tdy, tpl.hes, p_init_t,
      pt_ref_t)
    return p_out, pw_out, jnp.max(it_out)


class _TileGeom(NamedTuple):
    """Static geometry of the tiled windowed GN kernel (see
    _gn_tiled_pallas)."""
    tx: int        # grid columns per tile
    ty: int        # grid rows per tile
    nb: int        # patches per tile (= tx*ty, lane width)
    xb: int        # VMEM window width (128-aligned)
    yb: int        # VMEM window height (8-aligned)
    wbnd: int      # band window rows (stride-8 banding)
    nbands: int    # bands per window
    margin: int    # dynamic drift margin (ceil(outlierthresh)+2)
    hppp: int      # padded plane rows in HBM (DMA bound)
    wppp: int      # padded plane cols in HBM
    # extraction formulation: False = banded-lhs joint (band, hi/lo, x)
    # one-hot dot (K = nbands*2*xb); True = x-only dot (K = xb per plane)
    # followed by in-VMEM band masked-adds + 3-bit roll alignment. The
    # two-stage form has no banded-lhs scratch, which is what lets noc=3
    # (RGB) fit a window at all.
    two_stage: bool = False
    # in-kernel template extraction (ybs > 0 enables it): the kernel DMAs
    # a small static source-image window per tile and extracts the
    # templates/gradients/Hessian itself instead of reading (B, D, N)
    # HBM template arrays — killing their build + tiled-order relayout
    # (~25% of op-3 batch time). Static window dims; both fit inside the
    # target scratch (ybs <= yb, xbs <= xb), which is reused.
    ybs: int = 0   # source window rows (8-aligned)
    xbs: int = 0   # source window cols (128-aligned; DMA is xbs+128 wide)


# (tx, ty, xb, yb) tile/window candidates, tried per lane width nb=tx*ty.
# nb=256 first: half the programs and DMA traffic of nb=128 and double-width
# VPU ops per instruction (only the two-stage formulation fits the wide
# windows in VMEM); the nb=128 shapes remain as fallbacks for levels whose
# geometry or VMEM budget rejects the wide tiles. NOTE: every per-patch
# vector inside the kernel must stay rank-2 (1, nb) — Mosaic's layout
# inference crashes joining rank-1 layouts once nb spans two vregs.
_TILE_CANDIDATES = ((32, 8, 256, 64), (32, 8, 256, 72), (32, 8, 256, 80),
                    (64, 4, 384, 56), (16, 16, 256, 96),
                    (24, 8, 256, 64), (24, 8, 256, 72),
                    (16, 8, 256, 64), (16, 8, 256, 72), (16, 8, 256, 80),
                    (32, 4, 256, 56), (32, 4, 384, 56),
                    (64, 2, 384, 48), (128, 1, 512, 40))


def _pick_tile_geom(spec: LevelSpec, params: DISParams,
                    inkernel: bool = False):
    """Choose the tile/window geometry for a level, or None when no
    candidate fits the VMEM budget (then the caller falls back to the
    unwindowed nb-blocked kernel / XLA path).

    inkernel=True asks for in-kernel template extraction (source-window
    dims ybs/xbs set): granted per candidate when the static source
    window fits inside the target scratch it reuses; otherwise the
    candidate is kept with templates DMA'd from HBM as before.

    Two formulations are tried in order:
    1. two-stage: the dot contracts over x only (K = xb per hi/lo plane,
       M = w1*noc*yb), then band selection runs as nbands masked adds and
       the in-band alignment as a 3-bit roll. No banded-lhs scratch — this
       is what admits RGB (noc=3) windows AND the wide nb=256 tiles
       (measured ~5% faster end-to-end at op-3 than the banded-lhs form,
       which only fits nb=128).
    2. banded-lhs (single-stage): the in-VMEM lhs replicates the window
       into nbands stride-8 row bands so one joint (band, hi/lo, x) one-hot
       dot does extraction + band selection (K = nbands*2*xb). Kept as a
       fallback for tight-VMEM configurations and for A/B measurement
       (OF_DIS_TPU_TILE_SINGLE_STAGE=1 forces it).
    """
    psz, noc = params.p_samp_s, params.noc
    w1 = psz + 1
    w1c = w1 * noc
    d = psz * psz * noc
    steps = spec.steps
    wbnd = _round_up(psz + 1 + 7, 8)
    margin = int(np.ceil(params.outlierthresh)) + 2
    # ordered by K = nbands*2*xb (the extraction dot's contraction size):
    # yb=72 leaves 11px of within-tile flow-spread tolerance in y — enough
    # for coarse-to-fine flows — at one band less than yb=80
    # (32,4,256,56) measured only +1.7% (the kernel is VPU/skip-bound,
    # not dot-bound) at 8x tighter x-spread tolerance — robustness wins
    import os
    forms = ((False, True) if os.environ.get("OF_DIS_TPU_TILE_SINGLE_STAGE")
             else (True, False))
    # straggler-experiment knob: cap the lane width (patches per program) so
    # a slow-to-converge patch stalls a smaller tile (block-level early exit
    # granularity). 0/unset = no cap.
    nb_max = int(os.environ.get("OF_DIS_TPU_TILE_NB_MAX", "0"))
    for two_stage in forms:
        cap = _vmem_cap((6 if not two_stage else 9) * 1024 * 1024)
        for tx, ty, xb, yb in _TILE_CANDIDATES:
            nb = tx * ty           # lane width == patches per program
            if nb_max and nb > nb_max:
                continue
            # static coverage: tile spread + drift margin + alignment waste
            if (tx - 1) * steps + 2 * margin + 127 > xb - w1:
                continue
            if (ty - 1) * steps + 2 * margin + 7 > yb - wbnd + 7:
                continue
            nbands = (yb - wbnd) // 8 + 1
            nt = _extract_terms()
            # in-kernel template extraction: static source window (no
            # drift margin — template positions are the fixed grid), must
            # fit inside the target scratch it reuses
            ybs = xbs = 0
            if inkernel:
                xbs_c = _round_up((tx - 1) * steps + 127 + w1, 128)
                ybs_c = _round_up((ty - 1) * steps + 7 + wbnd, 8)
                if xbs_c <= xb and ybs_c <= yb:
                    ybs, xbs = ybs_c, xbs_c
            # channel-major per-channel staging (see _gn_tiled_pallas):
            # RGB two-stage programs extract one channel at a time, so the
            # big x-dot result and band temporaries are 1/noc-sized — this
            # is what admits nb=256 tiles for noc=3
            cm = _tiled_cm(two_stage, noc)
            w1t = w1 if cm else w1c              # per-dot row group
            if ybs:
                # tmpl/tdx/tdy live as values (no double-buffered input
                # blocks); t_src is the source x-dot temporary
                tpl_bytes = 3 * d * nb * 4 + w1t * ybs * nb * 4
            else:
                tpl_bytes = 2 * 3 * d * nb * 4  # blocked tmpl/tdx/tdy (x2)
            if cm:
                # patch/pdiff/lerp transients (d-sized) + channel-summed
                # pweight carry/outputs (d//noc, see _pw_dense)
                trans = (3 * d + 3 * (d // noc)) * nb * 4
            else:
                trans = (7 * d + 3 * (d // noc)) * nb * 4
            common = (nt * w1c * yb * xb * 2     # shifted-win scratch (bf16)
                      + nt * noc * yb * (xb + 128) * 2  # raw DMA window
                      + tpl_bytes + trans)
            if not two_stage:
                k = nbands * nt * xb
                est = (common
                       + w1c * wbnd * k * 2     # banded lhs scratch
                       + k * nb * 2             # one-hot (bf16)
                       + w1c * wbnd * nb * 4)   # t2
            else:
                est = (common
                       + xb * nb * 2            # x one-hot (bf16)
                       + w1t * yb * nb * 4      # t (x-dot result, per chan)
                       + 2 * w1t * wbnd * nb * 4  # band-selected + aligned
                       + (w1c * (psz + 1) * nb * 4 if cm else 0))  # cache a
            if est > cap:
                continue
            # over-pad by one full window so the clip of xs/ys to
            # [0, wppp-(xb+128)]/[0, hppp-yb] never forces a window that
            # starts before the desired origin (small levels: plane barely
            # taller than the window -> ys pinned at 0 -> bands short).
            # The DMA window is xb+128 wide: the kernel builds the w1
            # column-shifted copies from it in VMEM
            hppp = _round_up(spec.padded_height, 8) + yb
            wppp = _round_up(spec.padded_width, 128) + xb + 128
            return _TileGeom(tx, ty, nb, xb, yb, wbnd, nbands, margin,
                             hppp, wppp, two_stage, ybs, xbs)
    return None


def _src_origins(spec: LevelSpec, params: DISParams, geom: _TileGeom):
    """Static per-tile source-window origins for the in-kernel template
    extraction: (1, T) int32 each, 128/8-aligned. The window construction
    in _pick_tile_geom guarantees coverage of every tile's template span
    (positions are the fixed grid — no runtime validity needed)."""
    psz = params.p_samp_s
    _, _, t_tiles = _tile_perm(spec, geom)
    nty = -(-spec.noph // geom.ty)
    xs = np.empty((1, t_tiles), np.int32)
    ys = np.empty((1, t_tiles), np.int32)
    for ti in range(t_tiles):
        gx0 = (ti // nty) * geom.tx
        gy0 = (ti % nty) * geom.ty
        min_sx = spec.offsetw + gx0 * spec.steps - psz // 2 + spec.pad
        min_sy = spec.offseth + gy0 * spec.steps - psz // 2 + spec.pad
        assert min_sx >= 0 and min_sy >= 0
        xs[0, ti] = (min_sx // 128) * 128
        ys[0, ti] = (min_sy // 8) * 8
        assert xs[0, ti] + geom.xbs + 128 <= geom.wppp
        assert ys[0, ti] + geom.ybs <= geom.hppp
    return jnp.asarray(xs), jnp.asarray(ys)


def _build_planes_src(im, dx, dy, hppp: int, wppp: int) -> jnp.ndarray:
    """(B, C, Hp, Wp) source image + gradient fields -> (B, nt, 3, C,
    hppp, wppp) bf16 term-split planes for the in-kernel template
    extraction (field axis: 0 = image, 1 = dx, 2 = dy)."""
    cat = jnp.stack([im, dx, dy], axis=1)            # (B, 3, C, Hp, Wp)
    sh = jnp.pad(cat, ((0, 0), (0, 0), (0, 0),
                       (0, hppp - cat.shape[3]), (0, wppp - cat.shape[4])))
    return jnp.stack(_split_bf16(sh), axis=1)


def _tile_perm(spec: LevelSpec, geom: _TileGeom):
    """Static tiled patch ordering: tiles of tx grid-columns x ty grid-rows
    over the (nopw, noph) grid, column-major within a tile. Returns
    (perm, inv, T): perm (T*nb,) holds flat column-major patch ids (-1 for
    ragged padding); inv (N,) maps column-major id -> tiled slot."""
    nopw, noph = spec.nopw, spec.noph
    tx, ty = geom.tx, geom.ty
    ntx = -(-nopw // tx)
    nty = -(-noph // ty)
    slots = np.full((ntx * nty * tx * ty,), -1, np.int64)
    i = 0
    for gx in range(ntx):
        for gy in range(nty):
            for x in range(gx * tx, gx * tx + tx):
                for y in range(gy * ty, gy * ty + ty):
                    if x < nopw and y < noph:
                        slots[i] = x * noph + y
                    i += 1
    inv = np.empty((nopw * noph,), np.int64)
    inv[slots[slots >= 0]] = np.nonzero(slots >= 0)[0]
    return slots, inv, ntx * nty


def _tile_fwd(x: jnp.ndarray, spec: LevelSpec, geom: _TileGeom):
    """Reorder the patch (lane) axis from column-major to tiled order as a
    pad + reshape + transpose — pure relayout, no gather (a lane-axis
    jnp.take costs ~10 cycles/element on TPU). x: (B, K, N) -> (B, K, Np)."""
    b, k, _ = x.shape
    nopw, noph = spec.nopw, spec.noph
    tx, ty = geom.tx, geom.ty
    ntx = -(-nopw // tx)
    nty = -(-noph // ty)
    y = x.reshape(b, k, nopw, noph)
    y = jnp.pad(y, ((0, 0), (0, 0), (0, ntx * tx - nopw),
                    (0, nty * ty - noph)))
    y = y.reshape(b, k, ntx, tx, nty, ty)
    y = jnp.transpose(y, (0, 1, 2, 4, 3, 5))
    return y.reshape(b, k, ntx * nty * tx * ty)


def _tile_inv(x: jnp.ndarray, spec: LevelSpec, geom: _TileGeom):
    """Inverse of _tile_fwd: (B, K, Np) tiled order -> (B, K, N)."""
    b, k, _ = x.shape
    nopw, noph = spec.nopw, spec.noph
    tx, ty = geom.tx, geom.ty
    ntx = -(-nopw // tx)
    nty = -(-noph // ty)
    y = x.reshape(b, k, ntx, nty, tx, ty)
    y = jnp.transpose(y, (0, 1, 2, 4, 3, 5))
    y = y.reshape(b, k, ntx * tx, nty * ty)[:, :, :nopw, :noph]
    return y.reshape(b, k, nopw * noph)


def _build_planes2(im_b: jnp.ndarray, hppp: int, wppp: int) -> jnp.ndarray:
    """(B, C, Hp, Wp) padded level images -> (B, nterms, C, hppp, wppp)
    bf16 term-split planes, zero-padded to the DMA window bounds
    (nterms = 2, or 3 in exact-extract mode). The w1 column-shifted
    copies the extraction dot needs are built INSIDE the tiled kernel
    from each tile's DMA'd window — materializing them here cost a
    w1(=psz+1)-times-the-image HBM array (~119 MB/batch-8 at op-3 L1)
    and w1x the per-program window DMA traffic."""
    sh = jnp.pad(im_b, ((0, 0), (0, 0), (0, hppp - im_b.shape[2]),
                        (0, wppp - im_b.shape[3])))
    return jnp.stack(_split_bf16(sh), axis=1)       # (B, nt, C, hppp, wppp)


def _gn_tiled_pallas(spec: LevelSpec, params: DISParams, geom: _TileGeom,
                     planes2, tpl_p, p_init_p, ptr_p,
                     xs, ys, planes_src=None, xsrc=None, ysrc=None):
    """Windowed tiled Gauss-Newton kernel for large fine levels.

    The unwindowed fused kernel's one-hot extraction does O(Wp * Hp) MXU +
    VPU work per patch; at op-3/4 fine levels (Wp>500, N>12k) that caps
    throughput far below the VMEM-window formulation. Here each program
    handles one (pair, tile of tx*ty grid patches): it DMAs only the
    (yb, xb) plane window the tile can touch (positions are confined to
    ball(pt0, outlierthresh) by the reset rule, patch.cpp:196-206), builds
    a stride-8 banded lhs in VMEM once, and runs the full GN loop with a
    joint (band, hi/lo, x) one-hot dot of K = nbands*2*xb << 2*Wp.

    planes2: (B, nt, C, hppp, wppp) bf16 term-split plane images (the w1
    column-shifted copies are built in VMEM per program); tpl_p fields
    (B, D, Np) in
    tiled patch order; p_init_p (B, nop, Np); ptr_p (1, 2, Np) with -1e6
    at ragged-pad slots; xs/ys (B, T) int32 window origins (128/8-aligned).
    Returns (p (B, nop, Np), pweight (B, D, Np)) in tiled order.

    In-kernel template extraction (tpl_p None, planes_src/xsrc/ysrc set,
    geom.ybs > 0): instead of DMA'ing (D, nb) template/gradient blocks
    prepared (and tiled-order-relayouted) in HBM, each program DMAs the
    small static source window its tile's templates occupy (template
    positions are the fixed grid) from planes_src (B, nt, 3, C, hppp,
    wppp — field axis im/dx/dy) and extracts tmpl/tdx/tdy with the same
    two-stage one-hot machinery at integer anchors, then mean-normalizes
    (patnorm) and builds the Hessian in VMEM. Anchors come from ptr_p in
    int32 arithmetic — NOT through the float ceil(pt+1e-5) path, whose
    +1e-5 no longer survives f32 rounding at pt >= 128. For u8-sourced
    pyramids (levels <= 3) the bf16 hi/lo split is exact, so the
    extracted values are bit-identical to extract_templates'; the
    patnorm mean / Hessian / projection reductions may still differ
    from the XLA path by reduction-order ulps (measured |dp| <= ~1e-4
    after a full GN run).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    psz, nop, noc = params.p_samp_s, params.nop, params.noc
    w1 = psz + 1
    w1c = w1 * noc
    nb, xb, yb = geom.nb, geom.xb, geom.yb
    wbnd, nbands = geom.wbnd, geom.nbands
    nterms = planes2.shape[1]              # 2, or 3 in exact-extract mode
    kdim = nbands * nterms * xb
    b = planes2.shape[0]
    inkernel = planes_src is not None
    d = psz * psz * noc
    n_pad = p_init_p.shape[2]
    t_tiles = n_pad // nb
    nh = 3 if nop == 2 else 1
    ybs, xbs = geom.ybs, geom.xbs
    novals = float(params.novals)
    # channel-major per-channel staging for multi-channel two-stage tiles:
    # one x-dot + band-select + roll PER CHANNEL keeps the big (w1*yb, nb)
    # x-dot result and band temporaries 1/noc-sized, which is what fits
    # noc=3 into the wide nb=256 tiles (VMEM budget in _pick_tile_geom).
    # The kernel-internal patch element order becomes D' = (c, i, j) —
    # templates are extracted (or host-reordered) to match, the GN
    # reductions are order-agnostic, and the (i, j)-ordered pweight is
    # transposed to the interface's (j, i) once after the loop. noc == 1
    # uses the same order for the vectorized bilerp (_tiled_cm).
    cm = _tiled_cm(geom.two_stage, noc)

    def kernel(*refs):
        if inkernel:
            (xs_ref, ys_ref, xsrc_ref, ysrc_ref, planes_ref, src_ref,
             p0_ref, pr_ref, po_ref, pw_ref, it_ref, *scratch) = refs
        else:
            (xs_ref, ys_ref, planes_ref, tm_ref, tx_ref, ty_ref, he_ref,
             p0_ref, pr_ref, po_ref, pw_ref, it_ref, *scratch) = refs
        if geom.two_stage:
            wdma, win, sem = scratch
            lhs = None
        else:
            wdma, win, lhs, sem = scratch
        bi_ = pl.program_id(0)
        ti_ = pl.program_id(1)
        p_init = p0_ref[0]                  # (nop, nb)
        ptr = pr_ref[0]                     # (2, nb)

        if inkernel:
            # ---- in-kernel template extraction from the static source
            # window (reuses the wdma/win scratch before the target pass)
            xsr0 = pl.multiple_of(xsrc_ref[0, ti_], 128)
            ysr0 = pl.multiple_of(ysrc_ref[0, ti_], 8)
            # integer anchors straight from the (exact-integer) grid refs;
            # pad slots carry -1e6 -> empty one-hot -> zero templates
            sxs = ptr[0:1].astype(jnp.int32) - psz // 2 + spec.pad - xsr0
            sys_ = ptr[1:2].astype(jnp.int32) - psz // 2 + spec.pad - ysr0
            nbands_s = (ybs - wbnd) // 8 + 1
            colsx_s = jax.lax.broadcasted_iota(jnp.int32, (xbs, nb), 0)
            xh_s = (colsx_s == sxs).astype(jnp.bfloat16)
            band_s = jax.lax.shift_right_logical(sys_, 3)
            s3_s = jnp.bitwise_and(sys_, 7)

            def extract_field(f):
                dma_s = pltpu.make_async_copy(
                    src_ref.at[bi_, :, f, :, pl.ds(ysr0, ybs),
                               pl.ds(xsr0, xbs + 128)],
                    wdma.at[:, :, :ybs, :xbs + 128], sem)
                dma_s.start()
                dma_s.wait()
                for h in range(nterms):
                    for s in range(w1):
                        for ch in range(noc):
                            row = (ch * w1 + s) if cm else (s * noc + ch)
                            win[h, row, :ybs, :xbs] = \
                                wdma[h, ch, :ybs, s:s + xbs]

                def band_align(t3b):
                    tb = jnp.zeros((t3b.shape[0], wbnd, nb), jnp.float32)
                    for band in range(nbands_s):
                        m = (band_s == band)[None]
                        tb = tb + jnp.where(
                            m, t3b[:, 8 * band:8 * band + wbnd, :], 0.0)
                    a = tb
                    for bit in range(3):
                        amt = 1 << bit
                        rolled = pltpu.roll(a, (wbnd - amt) % wbnd, 1)
                        m = (jnp.bitwise_and(jax.lax.shift_right_logical(
                            s3_s, bit), 1) == 1)[None]
                        a = jnp.where(m, rolled, a)
                    return a

                if cm:
                    # per channel: x-dot + band/roll; integer anchors mean
                    # shifts 0..psz-1 are columns i, rows 0..psz-1 are j
                    chans = []
                    for ch in range(noc):
                        t = sum(jnp.dot(
                            win[h, ch * w1:(ch + 1) * w1, :ybs, :xbs]
                            .reshape(w1 * ybs, xbs), xh_s,
                            preferred_element_type=jnp.float32)
                            for h in range(nterms))
                        a = band_align(t.reshape(w1, ybs, nb))
                        chans.append(
                            a[:psz, :psz, :].reshape(psz * psz, nb))
                    return jnp.concatenate(chans, axis=0)   # D' = (c, i, j)
                t = sum(jnp.dot(
                    win[h, :, :ybs, :xbs].reshape(w1c * ybs, xbs), xh_s,
                    preferred_element_type=jnp.float32)
                    for h in range(nterms))
                a = band_align(t.reshape(w1c, ybs, nb))
                # integer anchors: rows j / shifts 0..psz-1 ARE the patch
                parts = []
                for j in range(psz):
                    row = a[:, j, :].reshape(w1, noc, nb)
                    parts.append(row[:psz].reshape(psz * noc, nb))
                return jnp.concatenate(parts, axis=0)       # (D, nb)

            tmpl = extract_field(0)
            if params.patnorm > 0:
                tmpl = tmpl - tmpl.mean(axis=0, keepdims=True)
            tdx = extract_field(1)
            tdy = extract_field(2) if nop == 2 else None
            # Hessian + det guard (extract_templates, patch.cpp:69-86)
            h00 = jnp.sum(tdx * tdx, axis=0, keepdims=True)
            if nop == 2:
                h01 = jnp.sum(tdx * tdy, axis=0, keepdims=True)
                h11 = jnp.sum(tdy * tdy, axis=0, keepdims=True)
                det = h00 * h11 - h01 * h01
                g = jnp.where(det == 0.0, 1e-10, 0.0)
                hes = jnp.concatenate([h00 + g, h01, h11 + g],
                                      axis=0)[None]
            else:
                hes = (h00 + jnp.where(h00 == 0.0, 1e-10, 0.0))[None]
        else:
            tmpl = tm_ref[0]                # (D, nb)
            tdx = tx_ref[0]
            tdy = ty_ref[0]
            hes = he_ref[0][None]           # (1, nh, nb) for _solve_step

        # alignment hints: Mosaic must prove the DMA offsets divide the
        # (8, 128) tiling (the host-side window computation guarantees it)
        xs0 = pl.multiple_of(xs_ref[bi_, ti_], 128)
        ys0 = pl.multiple_of(ys_ref[bi_, ti_], 8)
        dma = pltpu.make_async_copy(
            planes_ref.at[bi_, :, :, pl.ds(ys0, yb), pl.ds(xs0, xb + 128)],
            wdma, sem)
        dma.start()
        dma.wait()
        # build the w1 column-shifted copies in VMEM (win[h, s*noc+ch] =
        # window shifted left by s; channel-major ch*w1+s in cm mode): one
        # DMA of the raw window instead of w1 HBM plane copies — the
        # lane-offset slices are cheap VPU work paid once per program,
        # amortized over the GN iterations
        for h in range(nterms):
            for s in range(w1):
                for ch in range(noc):
                    row = (ch * w1 + s) if cm else (s * noc + ch)
                    win[h, row] = wdma[h, ch, :, s:s + xb]
        if not geom.two_stage:
            for band in range(nbands):
                for h in range(nterms):
                    blk = win[h, :, 8 * band:8 * band + wbnd, :]
                    col = (band * nterms + h) * xb
                    lhs[:, col:col + xb] = blk.reshape(w1c * wbnd, xb)

        def to_pt(p):
            if nop == 2:
                return ptr + p
            return jnp.concatenate(
                [ptr[0:1] + p, jnp.broadcast_to(ptr[1:2], p.shape)], axis=0)

        def oob(pt):
            # (1, nb) — every per-patch vector in this kernel is kept
            # rank-2: Mosaic's layout inference cannot join rank-1 vector
            # layouts once nb spans >1 vreg (crash in VectorLayout::join
            # at nb=256), and (1, nb) rows broadcast against (k, nb)
            # operands for free
            return ((pt[0:1] < spec.tmp_lb) | (pt[1:2] < spec.tmp_lb)
                    | (pt[0:1] > spec.tmp_ubw) | (pt[1:2] > spec.tmp_ubh))

        colsx = jax.lax.broadcasted_iota(jnp.int32, (xb, nb), 0)
        colsb = jax.lax.broadcasted_iota(jnp.int32, (nbands, nb), 0)

        def select_rows(sx, sy):
            """(w1c, psz+1, nb) aligned window rows for integer anchors
            (sx, sy), both (1, nb): the extraction dot + band/sub-band
            selection. Pure function of the integer positions — cached
            across GN iterations once patches stop crossing pixel cells."""
            band_i = jax.lax.shift_right_logical(sy, 3)     # (1, nb)
            s3 = jnp.bitwise_and(sy, 7)                     # (1, nb)
            xh = (colsx == sx).astype(jnp.bfloat16)
            if geom.two_stage:
                def band_align(t3b):
                    # stage 2a: 8-aligned band selection as masked adds
                    tb = jnp.zeros((t3b.shape[0], wbnd, nb), jnp.float32)
                    for band in range(nbands):
                        m = (band_i == band)[None]
                        tb = tb + jnp.where(
                            m, t3b[:, 8 * band:8 * band + wbnd, :], 0.0)
                    # stage 2b: in-band alignment a[:,j,:] = tb[:,s3+j,:]
                    # as a 3-bit conditional roll — measured faster than
                    # the 8-way masked adds HERE (w1c is 3x larger than
                    # the INT single-stage kernel's, so fewer bigger ops
                    # win; on the single-stage kernel masked adds win ~2%)
                    a = tb
                    for bit in range(3):
                        amt = 1 << bit
                        rolled = pltpu.roll(a, (wbnd - amt) % wbnd, 1)
                        m = (jnp.bitwise_and(jax.lax.shift_right_logical(
                            s3, bit), 1) == 1)[None]
                        a = jnp.where(m, rolled, a)
                    return a

                if cm:
                    # per-channel staging: x-dot + band/roll per channel
                    # (1/noc-sized temporaries); concatenated cache rows
                    # are channel-major (noc*w1, psz+1, nb)
                    chans = []
                    for ch in range(noc):
                        t = sum(jnp.dot(
                            win[h, ch * w1:(ch + 1) * w1].reshape(
                                w1 * yb, xb), xh,
                            preferred_element_type=jnp.float32)
                            for h in range(nterms))
                        a = band_align(t.reshape(w1, yb, nb))
                        chans.append(a[:, :psz + 1, :])
                    return jnp.concatenate(chans, axis=0)
                # stage 1: x-only extraction dot over the whole window
                # (M = w1c*yb, K = xb per term plane) — no banded lhs
                t = sum(jnp.dot(win[h].reshape(w1c * yb, xb), xh,
                                preferred_element_type=jnp.float32)
                        for h in range(nterms))
                return band_align(t.reshape(w1c, yb, nb))[:, :psz + 1, :]
            # joint (band, term, x) one-hot as a product of two small
            # one-hots (every term plane carries the same x one-hot)
            bh = (colsb == band_i).astype(jnp.bfloat16)
            oh = (bh[:, None, None, :]
                  * xh[None, None, :, :])               # (nbands, 1, xb, nb)
            oh = jnp.broadcast_to(oh, (nbands, nterms, xb, nb))
            t2 = jnp.dot(lhs[:], oh.reshape(kdim, nb),
                         preferred_element_type=jnp.float32)
            t3 = t2.reshape(w1c, wbnd, nb)
            # in-band row alignment: a[:, j, :] = t3[:, s3 + j, :]
            # (8 masked adds; the 3-bit conditional-roll form measured 2%
            # slower here — wbnd-row rolls cost more than the slices)
            a = jnp.zeros((w1c, psz + 1, nb), jnp.float32)
            for s in range(8):
                m = (s3 == s)[None]
                a = a + jnp.where(m, t3[:, s:s + psz + 1, :], 0.0)
            return a

        def extract_patch(pt, active, prev):
            """prev = (a, sx, sy) from the previous extraction or None.
            When no ACTIVE patch moved to a different integer cell, the
            dot + row selection are skipped and `a` is reused — after a
            few iterations positions settle and only the sub-pixel
            residual changes (stale rows of inactive patches are harmless:
            their outputs are masked by the active-gated carry update)."""
            pos_c = jnp.ceil(pt + 1e-5).astype(jnp.int32)
            resid = pt - jnp.floor(pt)
            sx = pos_c[0:1] - psz // 2 - 1 + spec.pad - xs0  # (1, nb)
            sy = pos_c[1:2] - psz // 2 - 1 + spec.pad - ys0
            rx = resid[0:1]                                  # (1, nb)
            ry = resid[1:2]
            # cache coordinates as (2, nb): rank-1 vectors through the
            # scf carry/cond crash Mosaic's layout inference
            sxy = jnp.concatenate([sx, sy], axis=0)
            if prev is None or not _use_extract_cache():
                a = select_rows(sx, sy)
            else:
                a_prev, sxyp = prev
                same = jnp.all((~active) | (sxy == sxyp))
                a = jax.lax.cond(same, lambda _: a_prev,
                                 lambda _: select_rows(sx, sy), None)
            if cm:
                # vectorized bilerp over the channel-major cache: ONE
                # y-lerp + ONE x-lerp over (noc, w1, psz, nb) instead of
                # psz small per-j ops; patch order D' = (c, i, j)
                a4 = a.reshape(noc, w1, psz + 1, nb)
                ry4 = ry[None, None]                    # (1, 1, 1, nb)
                rx4 = rx[None, None]
                ay = (1.0 - ry4) * a4[:, :, :psz, :] + ry4 * a4[:, :, 1:, :]
                px = (1.0 - rx4) * ay[:, :psz] + rx4 * ay[:, 1:]
                patch = px.reshape(psz * psz * noc, nb)
            else:
                rows = [a[:, j, :] for j in range(psz + 1)]
                ryk = ry
                rxk = rx[None]
                parts = []
                for j in range(psz):
                    wyj = (1.0 - ryk) * rows[j] + ryk * rows[j + 1]
                    wyj = wyj.reshape(w1, noc, nb)
                    pxj = (1.0 - rxk) * wyj[:psz] + rxk * wyj[1:]
                    parts.append(pxj.reshape(psz * noc, nb))
                patch = jnp.concatenate(parts, axis=0)  # (D, nb)
            if params.patnorm > 0:
                patch = patch - patch.mean(axis=0, keepdims=True)
            return patch, (a, sxy)

        # pweight placement (static): the loop only OBSERVES pweight at
        # the very end, and extraction is a pure per-lane function of the
        # position — so a single post-loop extraction at the final
        # positions reproduces the carried value bit-identically. That
        # epilogue drops a (psz*psz, nb) select (+ the per-iteration
        # channel clamp-sum in cm mode) from every GN trip and wins
        # wherever trips dominate the one extra extraction: noc=1 (op-3
        # +10% with the cm1 bilerp, op-4 +12% — 128 mandatory trips) and
        # any max_iter >= 32 config. The exception is multi-channel SHORT
        # loops (RGB op-3: 16 trips vs a 3-channel-dot epilogue — measured
        # 147.6 -> 142.8 net LOSS), which keep the legacy carried form.
        pw_in_loop = noc > 1 and params.max_iter < 32

        def compute_err(pt, active, prev):
            patch, cache = extract_patch(pt, active, prev)
            pdiff, pweight = loss_error_image(patch - tmpl, params.costfct)
            mares = jnp.sum(pweight, axis=0, keepdims=True)  # (1, nb)
            # carry the (nop, nb) projection, not the (D, nb) pdiff (see
            # the fused kernel: bit-exact, smaller carry, one less big sel)
            if pw_in_loop:
                return (rhs_of(pdiff), pw_dense_k(pweight),
                        mares / novals, cache)
            return rhs_of(pdiff), mares / novals, cache

        def rhs_of(pd):
            r0 = jnp.sum(tdx * pd, axis=0, keepdims=True)
            if nop == 2:
                return jnp.concatenate(
                    [r0, jnp.sum(tdy * pd, axis=0, keepdims=True)], axis=0)
            return r0

        def pw_dense_k(pw):
            # clamp-summed per-pixel denominator for this kernel's element
            # order. cm: per-iteration (the 1/noc carry shrink is the
            # point); noc==1: identity here — the clamp commutes with the
            # lane-select carry update, so it runs ONCE on the final carry
            # at the output write instead of every iteration
            if cm:
                return jnp.sum(jnp.maximum(
                    pw.reshape(noc, psz * psz, nb), MINERRVAL), axis=0)
            if noc == 1:
                return pw
            return _pw_dense(pw, psz, noc)

        pt0 = to_pt(p_init)
        init_oob = oob(pt0)                              # (1, nb)
        pt0_safe = jnp.where(init_oob,
                             jnp.broadcast_to(ptr, pt0.shape), pt0)
        all_on = jnp.ones((1, nb), jnp.bool_)
        _, tmpl_pw = loss_error_image(tmpl, params.costfct)
        if pw_in_loop:
            rhs0, pweight0, mares0, cache0 = compute_err(pt0_safe, all_on,
                                                         None)
            pweight0 = jnp.where(init_oob, pw_dense_k(tmpl_pw), pweight0)
        else:
            rhs0, mares0, cache0 = compute_err(pt0_safe, all_on, None)
        rhs0 = jnp.where(init_oob, rhs_of(tmpl), rhs0)
        active0 = ((~init_oob) & (params.max_iter > 0)
                   & (mares0 > params.res_thresh))

        def body(i, carry):
            if pw_in_loop:
                (p, rhs, pweight, active_f, mares, dpn_init, itcnt,
                 cache) = carry
            else:
                (p, rhs, active_f, mares, dpn_init, itcnt, cache) = carry
            active = active_f > 0.5                      # (1, nb)
            itcnt = itcnt + jnp.max(active_f)
            it1 = i + 1
            dp = _solve_step(hes, rhs[None], nop)[0]
            p_new = p - dp
            if nop == 1:
                if spec.camlr == 0:
                    p_new = jnp.minimum(p_new, 0.0)
                else:
                    p_new = jnp.maximum(p_new, 0.0)
            pt_new = to_pt(p_new)
            moved = jnp.sqrt(jnp.sum((pt_new - pt0) ** 2, axis=0,
                                     keepdims=True))
            reset = (moved > params.outlierthresh) | oob(pt_new)
            p_new = jnp.where(reset, p_init, p_new)
            pt_new = to_pt(p_new)
            if pw_in_loop:
                rhs_new, pweight_new, mares_new, cache_new = compute_err(
                    pt_new, active, cache)
            else:
                rhs_new, mares_new, cache_new = compute_err(
                    pt_new, active, cache)
            dp_sqnorm = jnp.sum(dp * dp, axis=0, keepdims=True)
            dpn_init_new = jnp.where(it1 == 1, dp_sqnorm, dpn_init)
            keep = ((it1 < params.max_iter)
                    & (mares_new > params.res_thresh)
                    & ((it1 < params.min_iter)
                       | (dp_sqnorm / dpn_init_new >= params.dp_thresh_sq))
                    & ((it1 < params.min_iter)
                       | (mares_new / mares <= params.dr_thresh)))
            active_new = active & keep & (~reset)

            def sel(new, old):
                return jnp.where(active, new, old)

            if pw_in_loop:
                return (sel(p_new, p), sel(rhs_new, rhs),
                        sel(pweight_new, pweight),
                        (active & active_new).astype(jnp.float32),
                        sel(mares_new, mares), sel(dpn_init_new, dpn_init),
                        itcnt, cache_new)
            return (sel(p_new, p), sel(rhs_new, rhs),
                    (active & active_new).astype(jnp.float32),
                    sel(mares_new, mares), sel(dpn_init_new, dpn_init),
                    itcnt, cache_new)

        if pw_in_loop:
            carry0 = (p_init, rhs0, pweight0, active0.astype(jnp.float32),
                      mares0, jnp.full((1, nb), 1e-10, jnp.float32),
                      jnp.float32(0.0), cache0)
            out = _masked_gn_loop(params.max_iter, body, carry0,
                                  active_idx=3)
            po_ref[0] = out[0]
            pweight = out[2]
            itcnt_out = out[6]
        else:
            carry0 = (p_init, rhs0, active0.astype(jnp.float32),
                      mares0, jnp.full((1, nb), 1e-10, jnp.float32),
                      jnp.float32(0.0), cache0)
            out = _masked_gn_loop(params.max_iter, body, carry0,
                                  active_idx=2)
            po_ref[0] = out[0]
            itcnt_out = out[5]
            # pweight epilogue: ONE full extraction at the final
            # positions. For every lane this is bit-identical to the
            # value the loop would have carried from its last active
            # iteration (extraction, patnorm and the loss are pure
            # per-lane functions of the position, and an inactive lane's
            # position never changes). The carried extraction cache
            # cannot be reused here — its rows track the would-be
            # positions of INACTIVE lanes too, which moved on past each
            # lane's final position.
            pt_fin = to_pt(out[0])
            pt_fin_safe = jnp.where(
                init_oob, jnp.broadcast_to(ptr, pt_fin.shape), pt_fin)
            patch_f, _ = extract_patch(pt_fin_safe, all_on, None)
            _, pweight_f = loss_error_image(patch_f - tmpl, params.costfct)
            pweight = jnp.where(init_oob, pw_dense_k(tmpl_pw),
                                pw_dense_k(pweight_f))
        if cm:
            # kernel-internal pixel order is (i, j); the interface wants
            # (j, i) — transpose once per program (psz slice-concats)
            pwij = pweight.reshape(psz, psz, nb)
            pw_ref[0] = jnp.concatenate(
                [pwij[:, jj, :] for jj in range(psz)], axis=0)
        elif noc == 1:
            pw_ref[0] = jnp.maximum(pweight, MINERRVAL)  # deferred clamp
        else:
            pw_ref[0] = pweight
        it_ref[bi_, ti_] = itcnt_out.astype(jnp.int32)

    blk_d = pl.BlockSpec((1, d, nb), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)
    blk_pwo = pl.BlockSpec((1, psz * psz, nb), lambda i, j: (i, 0, j),
                           memory_space=pltpu.VMEM)
    blk_h = pl.BlockSpec((1, nh, nb), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)
    blk_p = pl.BlockSpec((1, nop, nb), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)
    blk_ptr = pl.BlockSpec((1, 2, nb), lambda i, j: (0, 0, j),
                           memory_space=pltpu.VMEM)
    blk_it = pl.BlockSpec((b, t_tiles), lambda i, j: (0, 0),
                          memory_space=pltpu.SMEM)
    if inkernel:
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            blk_p, blk_ptr,
        ]
        operands = (xs, ys, xsrc, ysrc, planes2, planes_src,
                    p_init_p, ptr_p)
    else:
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            blk_d, blk_d, blk_d, blk_h, blk_p, blk_ptr,
        ]
        operands = (xs, ys, planes2, tpl_p.tmpl, tpl_p.tdx, tpl_p.tdy,
                    tpl_p.hes, p_init_p, ptr_p)
    return pl.pallas_call(
        kernel,
        grid=(b, t_tiles),
        out_shape=(jax.ShapeDtypeStruct((b, nop, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((b, psz * psz, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((b, t_tiles), jnp.int32)),
        in_specs=in_specs,
        out_specs=(blk_p, blk_pwo, blk_it),
        scratch_shapes=(
            [pltpu.VMEM((nterms, noc, yb, xb + 128), jnp.bfloat16),
             pltpu.VMEM((nterms, w1c, yb, xb), jnp.bfloat16)]
            + ([] if geom.two_stage else
               [pltpu.VMEM((w1c * wbnd, kdim), jnp.bfloat16)])
            + [pltpu.SemaphoreType.DMA(())]),
    )(*operands)


def _tile_windows(spec: LevelSpec, params: DISParams, geom: _TileGeom,
                  p_init_t, pt_ref_t, batch: int):
    """Tiled-order positions + per-(pair, tile) window origins + the window
    validity flag for _gn_tiled_pallas. Only position-sized arrays are
    transformed here — the big template fields are reordered INSIDE the
    tiled lax.cond branch so the conditional's operand set (and its
    entry/exit copies) stays small and the fallback branch reuses the
    untransformed originals."""
    psz, nop = params.p_samp_s, params.nop
    w1 = psz + 1
    b = batch
    perm, _, t_tiles = _tile_perm(spec, geom)
    pad_mask = jnp.asarray(perm < 0)
    take = lambda x: _tile_fwd(x, spec, geom)
    p_init_p = take(p_init_t)
    ptr_p = jnp.where(pad_mask[None, None, :], -1e6,
                      take(pt_ref_t))                    # (1, 2, n_pad)

    if nop == 2:
        pt0 = ptr_p + p_init_p
    else:
        pt0 = jnp.concatenate(
            [ptr_p[:, 0:1] + p_init_p,
             jnp.broadcast_to(ptr_p[:, 1:2], p_init_p.shape)], axis=1)
    oob0 = ((pt0[:, 0] < spec.tmp_lb) | (pt0[:, 1] < spec.tmp_lb)
            | (pt0[:, 0] > spec.tmp_ubw) | (pt0[:, 1] > spec.tmp_ubh)
            | pad_mask[None, :])                          # (B, n_pad)
    pos_c = jnp.ceil(pt0 + 1e-5).astype(jnp.int32)
    sx0 = pos_c[:, 0] - psz // 2 - 1 + spec.pad
    sy0 = pos_c[:, 1] - psz // 2 - 1 + spec.pad
    big = jnp.int32(1 << 24)
    mo = geom.margin

    def mima(v):
        lo = jnp.where(oob0, big, v).reshape(b, t_tiles, geom.nb).min(-1)
        hi = jnp.where(oob0, -big, v).reshape(b, t_tiles, geom.nb).max(-1)
        return lo, hi

    sxm, sxM = mima(sx0)
    sym, syM = mima(sy0)
    xs = jnp.clip(jnp.floor_divide(sxm - mo, 128) * 128, 0,
                  geom.wppp - (geom.xb + 128)).astype(jnp.int32)
    ys = jnp.clip(jnp.floor_divide(sym - mo, 8) * 8, 0,
                  geom.hppp - geom.yb).astype(jnp.int32)
    # coverage: every reachable column/row either inside the window or
    # off-plane on the same side (where the true extraction reads zeros too)
    empty = sxm > sxM   # tile fully init-oob/padding: window content unused
    ok_x = ((xs <= jnp.maximum(sxm - mo, 0))
            & (sxM + mo + w1 <= xs + geom.xb)) | empty
    ok_y = ((ys <= jnp.maximum(sym - mo, 0))
            & (syM + mo <= ys + geom.yb - geom.wbnd + 7)) | empty
    return p_init_p, ptr_p, xs, ys, ok_x & ok_y           # ok (B, T)


def _optimize_tiled(spec: LevelSpec, params: DISParams, geom: _TileGeom,
                    im_b, tpl, p_init_t, pt_ref_t, src=None):
    """Tiled windowed GN with bounded per-tile exact recompute.

    Window validity is per (pair, tile): a tile whose init positions exceed
    its static window (wild coarser flow — typically a motion-boundary tile)
    no longer sends the whole level to the slow unwindowed path. Instead the
    tiled kernel always runs (invalid tiles produce garbage harmlessly: the
    one-hot extraction of out-of-window anchors selects nothing) and up to
    k_max invalid tiles are recomputed exactly through the XLA path — the
    per-patch GN is independent, so recomputing just those patches matches
    the full fallback bit-for-bit. Only when more than k_max tiles are
    invalid does the whole level fall back. Returns (p, pweight, iters) as
    (B, nop, N), (B, D, N), () in column-major patch order.

    NOTE (measured dead end, r3): returning tiled order and letting densify
    contract against padded cover matrices is bit-exact but ~7x SLOWER —
    the (py,px,gx,gy,lx,ly)->(py,gy,ly,px,gx,lx) relayout it needs lowers
    to exotic-layout 7-D copies (~15 ms/batch-8 at op-3 L1 vs ~2.5 ms for
    the two separate 4-D transposes here + in densify). The tile interleave
    transpose is unavoidable (a separable selection-matrix extraction can
    produce only x-major x y-major lane orders) and XLA handles the 4-D
    forms near-optimally; keep them."""
    psz, noc = params.p_samp_s, params.noc
    b = im_b.shape[0]
    nb = geom.nb
    p_init_p, ptr_p, xs, ys, ok = _tile_windows(
        spec, params, geom, p_init_t, pt_ref_t, b)
    t_tiles = ok.shape[1]
    flat_ok = ok.reshape(-1)
    nbad = jnp.sum(~flat_ok)
    import os
    k_env = os.environ.get("OF_DIS_TPU_TILE_FIXUP_MAX")
    k_max = (int(k_env) if k_env is not None
             else min(16, max(4, 2 * b)))
    k_max = min(k_max, b * t_tiles)

    inkernel = geom.ybs > 0

    def tiled(_):
        planes2 = _build_planes2(im_b, geom.hppp, geom.wppp)
        if inkernel:
            planes_src = _build_planes_src(src[0], src[1], src[2],
                                           geom.hppp, geom.wppp)
            xsrc, ysrc = _src_origins(spec, params, geom)
            tpl_p = None
            p_fin, pw, it_out = _gn_tiled_pallas(
                spec, params, geom, planes2, None, p_init_p, ptr_p, xs, ys,
                planes_src, xsrc, ysrc)
        else:
            take = lambda x: _tile_fwd(x, spec, geom)
            tpl_p = PatchTemplates(take(tpl.tmpl), take(tpl.tdx),
                                   take(tpl.tdy), take(tpl.hes))
            tpl_k = tpl_p
            if _tiled_cm(geom.two_stage, noc):
                # the cm kernel's element order is (c, i, j); reorder the
                # HBM templates to match (the fix-up keeps tpl_p in the
                # XLA path's (j, i, c) order)
                def to_cm(x):
                    b_, _, np_ = x.shape
                    x5 = x.reshape(b_, psz, psz, noc, np_)
                    return jnp.transpose(x5, (0, 3, 2, 1, 4)).reshape(
                        b_, psz * psz * noc, np_)

                tpl_k = PatchTemplates(to_cm(tpl_p.tmpl), to_cm(tpl_p.tdx),
                                       to_cm(tpl_p.tdy), tpl_p.hes)
            p_fin, pw, it_out = _gn_tiled_pallas(
                spec, params, geom, planes2, tpl_k, p_init_p, ptr_p, xs, ys)
        if k_max == 0:       # fix-up disabled: any bad tile full-falls-back
            return (_tile_inv(p_fin, spec, geom),
                    _tile_inv(pw, spec, geom), jnp.max(it_out))

        nty = -(-spec.noph // geom.ty)
        ntx = -(-spec.nopw // geom.tx)

        def _tpl_cm_padded():
            # templates were never materialized on the inkernel route:
            # build them in column-major order and pad the grid axes to
            # whole tiles, so the per-chunk gather is k_max cheap
            # dynamic slices (the build + pad is the expensive part —
            # callers hoist it: the legacy path inside its nbad>0 cond,
            # the chunked path into a once-per-level lax.cond in chunk 0)
            tpl_cm = _batched_templates(spec, params, src)

            def padf(x):
                return jnp.pad(
                    x.reshape(b, x.shape[1], spec.nopw, spec.noph),
                    ((0, 0), (0, 0), (0, ntx * geom.tx - spec.nopw),
                     (0, nty * geom.ty - spec.noph)))

            return PatchTemplates(padf(tpl_cm.tmpl), padf(tpl_cm.tdx),
                                  padf(tpl_cm.tdy), padf(tpl_cm.hes))

        def fixup(pair_i, tile_i, tpl_pad=None):
            def g(x, k, pi):
                return jax.lax.dynamic_slice(
                    x, (pi, 0, tile_i[k] * nb), (1, x.shape[1], nb))[0]

            def gather(x):                               # (B, C_, T*nb)
                return jnp.stack(
                    [g(x, k, pair_i[k]) for k in range(k_max)], 0)

            if inkernel:
                if tpl_pad is None:
                    tpl_pad = _tpl_cm_padded()

                def gather_cm(xp):                  # (B, C_, ntx*tx, nty*ty)
                    def g4(k):
                        sl = jax.lax.dynamic_slice(
                            xp, (pair_i[k], 0,
                                 (tile_i[k] // nty) * geom.tx,
                                 (tile_i[k] % nty) * geom.ty),
                            (1, xp.shape[1], geom.tx, geom.ty))
                        return sl.reshape(xp.shape[1], nb)

                    return jnp.stack([g4(k) for k in range(k_max)], 0)

                tpl_fix = PatchTemplates(
                    gather_cm(tpl_pad.tmpl), gather_cm(tpl_pad.tdx),
                    gather_cm(tpl_pad.tdy), gather_cm(tpl_pad.hes))
            else:
                tpl_fix = PatchTemplates(
                    gather(tpl_p.tmpl), gather(tpl_p.tdx),
                    gather(tpl_p.tdy), gather(tpl_p.hes))
            p0_fix = gather(p_init_p)
            ptr_fix = jnp.stack(
                [g(ptr_p, k, 0) for k in range(k_max)], 0)  # (K, 2, nb)
            # slots from the same pair duplicate that pair's image (and its
            # shifted planes inside _gn_xla_path) — bounded at k_max copies
            # on a branch that only executes when a tile went invalid;
            # per-slot extraction dots are irreducible either way (each
            # slot's patches need their own one-hot dot)
            im_sel = jnp.take(im_b, pair_i, axis=0)
            return _gn_xla_path(spec, params, im_sel, tpl_fix, p0_fix,
                                ptr_fix)

        def scat(dst, new, pair_i, tile_i, slot_bad):
            # one batched scatter (k_max sequential dynamic-update-slices
            # on the (B, D, T*nb) buffers measured ~2 ms/batch of chained
            # copies). Duplicate slots (the nonzero fill) always carry
            # identical values, so scatter order cannot matter.
            cur = jax.vmap(lambda pi, ti: jax.lax.dynamic_slice(
                dst, (pi, 0, ti * nb), (1, dst.shape[1], nb))[0])(
                pair_i, tile_i)
            val = jnp.where(slot_bad[:, None, None], new, cur)
            d4 = dst.reshape(b, dst.shape[1], t_tiles, nb)
            d4 = d4.at[pair_i, :, tile_i].set(val)
            return d4.reshape(dst.shape)

        # invalid tiles' kernel iteration counts are garbage (their
        # windows extracted zeros): mask them out of the diagnostic like
        # their p/pweight are replaced below
        it_valid = jnp.max(jnp.where(ok, it_out, 0))

        if not legacy_cond:
            # ---- chunked exact recompute of ALL bad tiles: a while_loop
            # over k_max-slot chunks. Zero iterations on smooth content;
            # one chunk reproduces the old bounded fix-up; many chunks
            # replace the old whole-level fallback (bit-identical — the
            # per-patch GN is independent, so re-solving exactly the bad
            # tiles' patches through the same XLA path gives the same
            # values). Killing the level-sized lax.cond kills its join
            # relayout copies too (~3.7 ms/batch-16 at op-3 L1: the cond
            # was 26.6 ms of device time around a 22.9 ms kernel,
            # device profile r4).
            # rounded up to a k_max multiple so the last chunk's
            # dynamic_slice never clamps (a clamped start would desync
            # the slot values from the position-based validity mask)
            n_slots = -(-flat_ok.shape[0] // k_max) * k_max
            slots_all = jnp.nonzero(~flat_ok, size=n_slots,
                                    fill_value=0)[0].astype(jnp.int32)

            def run_chunks(args):
                # the whole fix-up loop lives inside the nbad>0 cond:
                # smooth batches pay only the predicate (the cond join is
                # patch-grid-sized — p/pw/it, ~1 MB — not kernel-output-
                # sized, so the round-4 join-copy concern doesn't apply),
                # and the padded column-major templates are built ONCE
                # here, closed over by every chunk (carrying them through
                # the loop cost smooth batches 4 full-size zero fills per
                # level — measured 304 -> 285 pairs/s smooth op-3 b16).
                p0, pw0, it0 = args
                tpl_pad = _tpl_cm_padded() if inkernel else None

                def chunk_body(carry):
                    c, p_c, pw_c, it_c = carry
                    base_i = c * k_max
                    slot = jax.lax.dynamic_slice(slots_all, (base_i,),
                                                 (k_max,))
                    # slot_bad MUST be validity-based (like the legacy
                    # path below), not position-based: pad slots beyond
                    # nbad carry fill slot 0, and if flat slot 0 is itself
                    # invalid a position mask would make the pad slots
                    # write the tiled kernel's garbage `cur` for (pair 0,
                    # tile 0) while the real slot writes the fix —
                    # duplicate-index .at[].set order is undefined, so the
                    # fix could be dropped. With ~flat_ok[slot], every
                    # duplicate of a bad slot carries the identical
                    # recomputed value (fixup is deterministic per
                    # (pair, tile)), so scatter order cannot matter.
                    slot_bad = ~flat_ok[slot]
                    pair_i = slot // t_tiles
                    tile_i = slot % t_tiles
                    p_fix, pw_fix, it_fix = fixup(pair_i, tile_i,
                                                  tpl_pad=tpl_pad)
                    return (c + 1,
                            scat(p_c, p_fix, pair_i, tile_i, slot_bad),
                            scat(pw_c, pw_fix, pair_i, tile_i, slot_bad),
                            jnp.maximum(it_c, it_fix))

                _, p_out, pw_out, it_res = jax.lax.while_loop(
                    lambda s: s[0] * k_max < nbad, chunk_body,
                    (jnp.int32(0), p0, pw0, it0))
                return p_out, pw_out, it_res

            p_out, pw_out, it_res = jax.lax.cond(
                nbad > 0, run_chunks, lambda a: a, (p_fin, pw, it_valid))
            return (_tile_inv(p_out, spec, geom),
                    _tile_inv(pw_out, spec, geom), it_res)

        # ---- legacy bounded fix-up (single chunk) + whole-level-fallback
        # outer cond (OF_DIS_TPU_LEVEL_FALLBACK=1 A/B escape)
        slot = jnp.nonzero(~flat_ok, size=k_max, fill_value=0)[0]
        slot_bad = ~flat_ok[slot]
        pair_i = slot // t_tiles
        tile_i = slot % t_tiles

        def with_fix(_):
            p_fix, pw_fix, it_fix = fixup(pair_i, tile_i)
            return (scat(p_fin, p_fix, pair_i, tile_i, slot_bad),
                    scat(pw, pw_fix, pair_i, tile_i, slot_bad),
                    jnp.maximum(it_valid, it_fix))

        def no_fix(_):
            return (p_fin, pw, it_valid)

        p_out, pw_out, it_res = jax.lax.cond(nbad > 0, with_fix, no_fix,
                                             operand=None)
        return (_tile_inv(p_out, spec, geom),
                _tile_inv(pw_out, spec, geom), it_res)

    def fallback(_):
        tpl_fb = (_batched_templates(spec, params, src) if inkernel
                  else tpl)
        return _gn_xla_path(spec, params, im_b, tpl_fb, p_init_t, pt_ref_t)

    legacy_cond = (k_max == 0
                   or bool(os.environ.get("OF_DIS_TPU_LEVEL_FALLBACK")))
    if legacy_cond:
        return jax.lax.cond(nbad <= k_max, tiled, fallback, operand=None)
    return tiled(None)


@partial(jax.jit, static_argnames=("spec", "params", "src_exact",
                                   "tgt_exact"))
def optimize_level_batched(spec: LevelSpec, params: DISParams,
                           im_b: jnp.ndarray, tpl,
                           p_init: jnp.ndarray, src=None,
                           src_exact: bool = False,
                           tgt_exact: bool = False) -> PatchResult:
    """Optimize all patches of one scale for a whole frame-pair batch
    (PatGridClass::Optimize, patchgrid.cpp:134-141 + PatClass::OptimizeIter,
    patch.cpp:156-210).

    im_b: (B, C, Hp, Wp) padded target images; tpl fields carry a leading B;
    p_init: (B, N, nop). Native batching (instead of vmap) lets the one-hot
    extraction run as one batched MXU dot and the row-select/bilerp stage as
    one batch-blocked Pallas kernel.

    tpl may be None when `src` = (im_a, dx_a, dy_a) source fields are
    given instead: templates are then built lazily per strategy — and
    the tiled kernel skips materializing them entirely (extracting
    in-kernel from a static source window) when `src_exact` declares
    the pyramid u8-sourced (bf16 hi/lo plane reconstruction exact, so
    the in-kernel values are bit-identical to extract_templates') at a
    level where that exactness holds (images need 8+2*lv significand
    bits, Sobel/8 gradients 11+2*lv; hi/lo covers 16).

    `tgt_exact` declares the TARGET pyramid (im_b) u8-sourced: at
    levels <= 4 the fused kernel then runs its extraction dot in int8
    (hi/lo channel-stacked planes, _banded_planes_raw_i8) — the dot is
    97% of the fused kernel (PERF.md ablation) and the i8 MXU rate is
    ~1.5x bf16's, with bit-identical extracted values.
    """
    psz, pad, nop = params.p_samp_s, spec.pad, params.nop
    noc = params.noc
    novals = float(params.novals)
    pt_ref = grid_ref_points(spec)                      # (N, 2)
    n = pt_ref.shape[0]
    b = im_b.shape[0]
    hp, wp = im_b.shape[2], im_b.shape[3]
    use_pallas = _use_pallas_bilerp()
    p_init_t = jnp.swapaxes(p_init, 1, 2)               # (B, nop, N)
    pt_ref_t = pt_ref.T[None]                           # (1, 2, N)

    def ensure_tpl(t):
        if t is not None:
            return t
        assert src is not None, "optimize_level_batched needs tpl or src"
        return _batched_templates(spec, params, src)

    def to_pt(p):
        # (B, nop, N) -> (B, 2, N)
        if nop == 2:
            return pt_ref_t + p
        return pt_ref_t + jnp.concatenate([p, jnp.zeros_like(p)], axis=1)

    if use_pallas:
        # fused whole-loop kernel (see _gn_fused_pallas)
        _, hpb, _ = _gn_windows(psz, hp)
        d = psz * psz * noc
        cache_on = _use_extract_cache() and params.max_iter >= 32
        # pair packing: fill the lane axis at small-grid coarse levels
        # (see _gn_fused_pallas gpk docs); pack only up to one full vreg.
        # MEASURED NET LOSS at op-2 batch 384, hence opt-in: the coarsest
        # GN kernel drops 1.48->0.85 ms, but the batch->lane pack/unpack
        # transposes around it cost ~0.9 ms of exotic-layout XLA copies
        # (34.7 -> 34.9 ms end-to-end). Kept behind OF_DIS_TPU_PAIR_PACK=1
        # for TPU generations with different relayout/VPU cost ratios.
        import os
        gpk = 1
        if os.environ.get("OF_DIS_TPU_PAIR_PACK"):
            for cand in (4, 3, 2):
                if n * cand <= 128 and b % cand == 0:
                    gpk = cand
                    break
        use_i8 = (tgt_exact and spec.level <= 4 and gpk == 1
                  and not os.environ.get("OF_DIS_TPU_NO_I8_EXTRACT"))
        bb = _pick_gn_bb(b // gpk, psz + 1, noc, hpb, wp * gpk, d, n * gpk,
                         use_cache=cache_on, i8=use_i8)
        if bb is None and gpk > 1:
            gpk = 1
            use_i8 = (tgt_exact and spec.level <= 4
                      and not os.environ.get("OF_DIS_TPU_NO_I8_EXTRACT"))
            bb = _pick_gn_bb(b, psz + 1, noc, hpb, wp, d, n,
                             use_cache=cache_on, i8=use_i8)
        nb = 0
        if bb is None:
            # large op-3/4 levels: one pair's full patch set busts VMEM.
            # Preferred: the tiled windowed kernel (VMEM plane windows per
            # 2-D patch tile — O(window) instead of O(Wp*Hp) work per
            # patch), with a runtime fall back to the XLA path when a
            # tile's coarser-flow spread exceeds its static window.
            want_ik = (src is not None and src_exact and spec.level <= 3
                       and psz % 2 == 0
                       and not os.environ.get("OF_DIS_TPU_NO_INKERNEL_TPL"))
            geom = _pick_tile_geom(spec, params, inkernel=want_ik)
            if geom is not None:
                tpl_t = tpl if geom.ybs > 0 else ensure_tpl(tpl)
                p_fin, pw, iters = _optimize_tiled(spec, params, geom,
                                                   im_b, tpl_t, p_init_t,
                                                   pt_ref_t, src=src)
                return PatchResult(
                    p=jnp.swapaxes(p_fin, 1, 2),
                    pt=jnp.swapaxes(to_pt(p_fin), 1, 2),
                    pweight=pw.reshape(b, psz, psz, n),
                    iters=iters)
            # legacy unwindowed patch-blocking (e.g. RGB fine levels where
            # the tiled geometry does not fit VMEM)
            nb = _pick_gn_nb(psz + 1, noc, hpb, wp, d, n,
                             use_cache=cache_on, i8=use_i8)
            if nb is not None:
                bb = 1
        if bb is not None:
            tpl = ensure_tpl(tpl)
            n_pad = n if not nb else _round_up(n, nb)
            tpl_k, p_init_k, pt_ref_k = tpl, p_init_t, pt_ref_t
            if n_pad != n:
                e = n_pad - n
                pad3 = lambda x, v=0.0: jnp.pad(
                    x, ((0, 0), (0, 0), (0, e)), constant_values=v)
                hes_pad = jnp.pad(
                    tpl.hes, ((0, 0), (0, 0), (0, e)),
                    constant_values=1.0) if nop == 1 else jnp.concatenate(
                    [jnp.pad(tpl.hes[:, 0:1], ((0, 0), (0, 0), (0, e)),
                             constant_values=1.0),
                     pad3(tpl.hes[:, 1:2]),
                     jnp.pad(tpl.hes[:, 2:3], ((0, 0), (0, 0), (0, e)),
                             constant_values=1.0)], axis=1)
                tpl_k = PatchTemplates(pad3(tpl.tmpl), pad3(tpl.tdx),
                                       pad3(tpl.tdy), hes_pad)
                p_init_k = pad3(p_init_t)
                pt_ref_k = pad3(pt_ref_t, v=-1e6)
            if use_i8:
                lhs = jax.vmap(lambda x: _banded_planes_raw_i8(
                    x, hpb, spec.level))(im_b)
            else:
                lhs = jax.vmap(lambda x: _banded_planes_raw(x, hpb))(im_b)
            if gpk > 1:
                def pack(x):     # (B, K, N) -> (B/g, K, g*N), g-major lanes
                    b_, k_, n_ = x.shape
                    return x.reshape(b_ // gpk, gpk, k_, n_).transpose(
                        0, 2, 1, 3).reshape(b_ // gpk, k_, gpk * n_)

                lhs = pack(lhs)
                tpl_k = PatchTemplates(pack(tpl_k.tmpl), pack(tpl_k.tdx),
                                       pack(tpl_k.tdy), pack(tpl_k.hes))
                p_init_k = pack(p_init_k)
                pt_ref_k = jnp.concatenate([pt_ref_k] * gpk, axis=2)
            p_fin, pw, iters = _gn_fused_pallas(spec, params, lhs, tpl_k,
                                                p_init_k, pt_ref_k, bb,
                                                hpb, nb, gpk)
            if gpk > 1:
                def unpack(x):   # (B/g, K, g*N) -> (B, K, N)
                    b_, k_, gn = x.shape
                    return x.reshape(b_, k_, gpk, gn // gpk).transpose(
                        0, 2, 1, 3).reshape(b_ * gpk, k_, gn // gpk)

                p_fin = unpack(p_fin)
                pw = unpack(pw)
            p_fin = p_fin[:, :, :n]
            pw = pw[:, :, :n]
            return PatchResult(
                p=jnp.swapaxes(p_fin, 1, 2),
                pt=jnp.swapaxes(to_pt(p_fin), 1, 2),
                pweight=pw.reshape(b, psz, psz, n),
                iters=iters)

    p_fin, pw, iters = _gn_xla_path(spec, params, im_b, ensure_tpl(tpl),
                                    p_init_t, pt_ref_t)
    return PatchResult(p=jnp.swapaxes(p_fin, 1, 2),
                       pt=jnp.swapaxes(to_pt(p_fin), 1, 2),
                       pweight=pw.reshape(b, psz, psz, n),
                       iters=iters)


def _gn_xla_path(spec: LevelSpec, params: DISParams, im_b: jnp.ndarray,
                 tpl: PatchTemplates, p_init_t: jnp.ndarray,
                 pt_ref_t: jnp.ndarray):
    """Pure-XLA while-loop Gauss-Newton (the reference semantics without
    Pallas): returns (p (B, nop, N), pweight (B, D, N), iters)."""
    psz, pad, nop = params.p_samp_s, spec.pad, params.nop
    noc = params.noc
    novals = float(params.novals)
    n = tpl.tmpl.shape[2]
    b = im_b.shape[0]
    hp, wp = im_b.shape[2], im_b.shape[3]
    use_pallas = _use_pallas_bilerp()

    def to_pt(p):
        if nop == 2:
            return pt_ref_t + p
        return pt_ref_t + jnp.concatenate([p, jnp.zeros_like(p)], axis=1)

    lhs_planes = jax.vmap(lambda x: _shifted_planes(x, psz))(im_b)

    def oob(pt):
        return ((pt[:, 0] < spec.tmp_lb) | (pt[:, 1] < spec.tmp_lb)
                | (pt[:, 0] > spec.tmp_ubw) | (pt[:, 1] > spec.tmp_ubh))

    # chunk the extraction over patches when the full t tensor would be
    # huge (op-4 finest levels: n up to ~50k -> t is GBs per pair); the
    # chunked map bounds peak memory to one chunk's extraction
    n_chunk = 0
    w1 = psz + 1
    if b * w1 * noc * hp * n * 4 > _XLA_T_BUDGET:
        n_chunk = min(4096, _round_up(n // 8 + 1, 128))

    def _extract(pt_t):
        if not n_chunk:
            return extract_bilinear_mxu_batched(
                lhs_planes, pt_t, psz, pad, noc, hp, wp, use_pallas)
        n_pad = _round_up(n, n_chunk)
        ptp = jnp.pad(pt_t, ((0, 0), (0, n_pad - n), (0, 0)))
        chunks = jnp.moveaxis(
            ptp.reshape(b, n_pad // n_chunk, n_chunk, 2), 1, 0)
        out = jax.lax.map(
            lambda c: extract_bilinear_mxu_batched(
                lhs_planes, c, psz, pad, noc, hp, wp, use_pallas),
            chunks)                                   # (K, B, D, nc)
        out = jnp.moveaxis(out, 0, 2)                 # (B, D, K, nc)
        return out.reshape(b, out.shape[1], n_pad)[:, :, :n]

    def compute_err(pt):
        patch = _extract(jnp.swapaxes(pt, 1, 2))
        if params.patnorm > 0:
            patch = patch - patch.mean(axis=1, keepdims=True)
        pdiff, pweight = loss_error_image(patch - tpl.tmpl, params.costfct)
        mares = jnp.sum(pweight, axis=1) / novals
        return pdiff, _pw_dense(pweight, psz, noc), mares

    # ---- OptimizeStart (patch.cpp:118-154)
    pt0 = to_pt(p_init_t)
    init_oob = oob(pt0)                                 # (B, N)
    pt0_safe = jnp.where(init_oob[:, None, :], pt_ref_t, pt0)
    pdiff0, pweight0, mares0 = compute_err(pt0_safe)
    # init-OOB patches: pdiff = template; pweight = cost-weight of template
    # (documented deviation, see module docstring)
    tmpl_pd, tmpl_pw = loss_error_image(tpl.tmpl, params.costfct)
    m = init_oob[:, None, :]
    pdiff0 = jnp.where(m, tpl.tmpl, pdiff0)
    pweight0 = jnp.where(m, _pw_dense(tmpl_pw, psz, noc), pweight0)
    # cnt==0 convergence: only the residual threshold can stop here
    active0 = (~init_oob) & (params.max_iter > 0) & (mares0 > params.res_thresh)

    state = dict(
        p=p_init_t, pdiff=pdiff0, pweight=pweight0, active=active0,
        mares=mares0,
        dpn_init=jnp.full((b, n), 1e-10, jnp.float32),
        it=jnp.asarray(0, jnp.int32),
    )

    def cond(s):
        return (s["it"] < params.max_iter) & jnp.any(s["active"])

    def body(s):
        act = s["active"]
        it1 = s["it"] + 1
        # steepest-descent projection (patch.cpp:175-180)
        rhs0 = jnp.sum(tpl.tdx * s["pdiff"], axis=1)
        if nop == 2:
            rhs1 = jnp.sum(tpl.tdy * s["pdiff"], axis=1)
            rhs = jnp.stack([rhs0, rhs1], axis=1)
        else:
            rhs = rhs0[:, None, :]
        dp = _solve_step(tpl.hes, rhs, nop)
        p_new = s["p"] - dp
        if nop == 1:  # depth disparity sign clamp (patch.cpp:186-191)
            if spec.camlr == 0:
                p_new = jnp.minimum(p_new, 0.0)
            else:
                p_new = jnp.maximum(p_new, 0.0)
        pt_new = to_pt(p_new)
        # outlier / out-of-bounds reset (patch.cpp:196-206)
        moved = jnp.sqrt(jnp.sum((pt_new - pt0) ** 2, axis=1))
        reset = (moved > params.outlierthresh) | oob(pt_new)
        p_new = jnp.where(reset[:, None, :], p_init_t, p_new)
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
            if new.ndim == 2:
                return jnp.where(act, new, old)
            return jnp.where(act[:, None, :], new, old)

        return dict(
            p=sel(p_new, s["p"]), pdiff=sel(pdiff_new, s["pdiff"]),
            pweight=sel(pweight_new, s["pweight"]),
            active=act & active_new,
            mares=sel(mares_new, s["mares"]),
            dpn_init=sel(dpn_init, s["dpn_init"]),
            it=it1,
        )

    final = jax.lax.while_loop(cond, body, state)
    return final["p"], final["pweight"], final["it"]


def optimize_level(spec: LevelSpec, params: DISParams, im_b: jnp.ndarray,
                   tpl: PatchTemplates, p_init: jnp.ndarray) -> PatchResult:
    """Single-pair convenience wrapper around optimize_level_batched.

    im_b: (C, Hp, Wp); tpl fields (D, N)-shaped; p_init (N, nop).
    """
    tpl_b = PatchTemplates(*(f[None] for f in tpl))
    res = optimize_level_batched(spec, params, im_b[None], tpl_b,
                                 p_init[None])
    return PatchResult(*(f[0] if f.ndim else f for f in res))


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
