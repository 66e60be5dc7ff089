"""TV (DeepFlow-style) variational refinement, vectorized for TPU.

Rebuilds the reference's refine_variational.{h,cpp} + FDF1.0.1 kernel library
(opticalflow_aux.c, solver.c) as pure JAX array ops over (C,H,W) images and
(H,W) flow fields:

  - bilinear backward warp + in-bounds mask (opticalflow_aux.c:33-75),
  - 5-tap derivative convolutions [1,-8,0,8,-1]/12 with replicate borders
    (refine_variational.cpp:45-48 + image.cpp:578-624 fast-5 border handling),
  - TV diffusivity / smoothness edge weights (opticalflow_aux.c:138-187),
  - robust data term assembling the per-pixel 2x2 system (opticalflow_aux.c:
    408-594), including the upstream quirks of the RGB path (see
    `compute_data_rgb`), and the 1-D depth variant (601-747),
  - sub_laplacian residual update (opticalflow_aux.c:194-223),
  - coupled SOR as a red-black (checkerboard) Gauss-Seidel sweep. The
    reference sweeps rows in raster order (solver.c:34-78); a serial raster
    sweep has no lane-parallel equivalent on TPU, so we use red-black
    ordering, which is mathematically Gauss-Seidel on the 5-point stencil but
    visits pixels in a different order. With the small solver iteration counts
    used (tv_solverit=3 at the op-points) the orderings agree to well within
    the 1%-EPE parity budget (validated in tests/test_tv.py).

Fixed constants follow opticalflow_aux.c:25-29.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

DATANORM = 0.1 * 0.1          # opticalflow_aux.c:25
EPS_COLOR = 0.001 * 0.001
EPS_GRAD = 0.001 * 0.001
EPS_SMOOTH = 0.001 * 0.001


# ---------------------------------------------------------------- warping

def warp_image(src: jnp.ndarray, wx: jnp.ndarray, wy: jnp.ndarray
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bilinear backward warp with clamped sampling + in-bounds mask
    (image_warp, opticalflow_aux.c:33-75). src (C,H,W); wx/wy (H,W).

    Corners are fetched as four flat single-axis gathers — a 2D
    advanced-index gather on a (C,H,W) operand lowers ~10x slower on TPU."""
    c, h, w = src.shape
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    xx = gx + wx
    yy = gy + wy
    mask = ((xx >= 0) & (xx <= w - 1) & (yy >= 0) & (yy <= h - 1)
            ).astype(jnp.float32)
    x0 = jnp.floor(xx)
    y0 = jnp.floor(yy)
    dx = xx - x0
    dy = yy - y0
    x1 = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x2 = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    y1 = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y2 = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
    flat = src.reshape(c, h * w)

    def take(iy_, ix_):
        # per-channel 1-D takes: any unit/batch dim around the gather axis
        # makes XLA:TPU pick a much slower lowering
        idx = (iy_ * w + ix_).reshape(h * w)
        g = [jnp.take(flat[ch], idx) for ch in range(c)]
        return jnp.stack(g, 0).reshape(c, h, w)

    v11 = take(y1, x1)
    v12 = take(y1, x2)
    v21 = take(y2, x1)
    v22 = take(y2, x2)
    out = (v11 * (1 - dx) * (1 - dy) + v12 * dx * (1 - dy)
           + v21 * (1 - dx) * dy + v22 * dx * dy)
    return out, mask


def _warp_coeffs(wx: jnp.ndarray, wy: jnp.ndarray):
    """Bilinear warp sampling coefficients for (..., H, W) flow fields:
    corner indices (clamped), fractional weights, and the in-bounds mask
    (image_warp, opticalflow_aux.c:33-75)."""
    h, w = wx.shape[-2], wx.shape[-1]
    # integer iota + convert: Mosaic only lowers integer tpu.iota
    gy = jax.lax.broadcasted_iota(jnp.int32, wx.shape,
                                  wx.ndim - 2).astype(jnp.float32)
    gx = jax.lax.broadcasted_iota(jnp.int32, wx.shape,
                                  wx.ndim - 1).astype(jnp.float32)
    xx = gx + wx
    yy = gy + wy
    mask = ((xx >= 0) & (xx <= w - 1) & (yy >= 0) & (yy <= h - 1)
            ).astype(jnp.float32)
    x0 = jnp.floor(xx)
    y0 = jnp.floor(yy)
    dx = xx - x0
    dy = yy - y0
    x1 = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x2 = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    y1 = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y2 = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
    return x1, x2, y1, y2, dx, dy, mask


def _warp_coeffs_pallas(wx: jnp.ndarray, wy: jnp.ndarray, bb: int):
    """The warp's index/weight arithmetic as one fused Pallas kernel.

    In XLA this ~15-op elementwise chain costs several ms at DIS level sizes
    (per-op overhead on small fields); fused in VMEM it is negligible.
    wx/wy (B, H, W)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w = wx.shape

    def kernel(wx_ref, wy_ref, x1_ref, x2_ref, y1_ref, y2_ref, dx_ref,
               dy_ref, mask_ref):
        x1, x2, y1, y2, dx, dy, mask = _warp_coeffs(wx_ref[:], wy_ref[:])
        x1_ref[:] = x1
        x2_ref[:] = x2
        y1_ref[:] = y1
        y2_ref[:] = y2
        dx_ref[:] = dx
        dy_ref[:] = dy
        mask_ref[:] = mask

    fld = pl.BlockSpec((bb, h, w), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    i32 = jax.ShapeDtypeStruct(wx.shape, jnp.int32)
    f32 = jax.ShapeDtypeStruct(wx.shape, jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(b // bb,),
        out_shape=(i32, i32, i32, i32, f32, f32, f32),
        in_specs=[fld, fld],
        out_specs=(fld,) * 7,
    )(wx, wy)


def _use_mxu_warp(b: int, c: int, h: int, w: int, horiz_only: bool) -> bool:
    # Per-pair HBM budget for the one-hot interpolation operands of the MXU
    # warp (the A matrices plus the x-interpolated Z tensor). Levels above
    # it use the banded shifted-slab warp (warp_image_banded) with a gather
    # fallback. Measured crossover on v5e: op-2 levels (<=6 MB/pair) are
    # ~40% faster on the MXU path, while op-3/4 fine levels (>=42 MB/pair)
    # are faster banded — 32 MB splits them with batch-independent routing.
    # Env-tunable (MB per pair) for other TPU generations.
    import os
    if os.environ.get("OF_DIS_TPU_NO_MXU_WARP"):
        return False
    a_bytes = h * w * w * 4
    z_bytes = 0 if horiz_only else c * h * h * w * 4
    legacy = os.environ.get("OF_DIS_TPU_MXU_WARP_GB")
    if legacy is not None:
        # pre-round-3 knob: absolute budget over the whole batch
        return b * (a_bytes + z_bytes) < int(float(legacy) * 1024 ** 3)
    budget = int(float(os.environ.get("OF_DIS_TPU_MXU_WARP_MB", "32"))
                 * 1024 ** 2)
    return a_bytes + z_bytes < budget


def warp_image_mxu(src: jnp.ndarray, coeffs):
    """Gather-free bilinear backward warp on the MXU.

    XLA:TPU gathers are element-bound (~10 cycles/element) and dominated the
    TV stage even with packed corner pairs. Instead, bilinear sampling is a
    product of two one-hot interpolations: for each output row o a sparse
    matrix A[o] in R^{W x W} combines columns x1/x2 with weights (1-dx)/dx,
    and a one-hot weighted reduction over input rows y combines rows y1/y2
    with weights (1-dy)/dy (clamped indices reproduce image_warp's border
    handling, opticalflow_aux.c:33-75, exactly):

        Z[c,y,o,X] = sum_x src[c,y,x] * A[o,x,X]          (MXU matmul)
        out[c,o,X] = sum_y V[y,o,X] * Z[c,y,o,X]          (VPU fused reduce)

    f32 HIGHEST precision keeps the result within ~1e-5 of the exact gather
    path. src (B,C,H,W); coeffs from _warp_coeffs[_pallas]."""
    x1, x2, y1, y2, dx, dy, mask = coeffs
    b, c, h, w = src.shape
    # A laid out (b, x, o, X): batch, contract, free — the dot-friendly order
    xin = jax.lax.broadcasted_iota(jnp.int32, (b, w, h, w), 1)
    dxe = dx[:, None]
    A = (jnp.where(xin == x1[:, None], 1.0 - dxe, 0.0)
         + jnp.where(xin == x2[:, None], dxe, 0.0))
    Z = jnp.einsum("bcyx,bxoX->bcyoX", src, A,
                   precision=jax.lax.Precision.HIGHEST)
    yin = jax.lax.broadcasted_iota(jnp.int32, (b, h, h, w), 1)   # (b,y,o,X)
    dye = dy[:, None]
    V = (jnp.where(yin == y1[:, None], 1.0 - dye, 0.0)
         + jnp.where(yin == y2[:, None], dye, 0.0))
    out = jnp.sum(V[:, None] * Z, axis=2)                        # (b,c,o,X)
    return out, mask


def warp_image_mxu_h(src: jnp.ndarray, coeffs):
    """Horizontal-only MXU warp for the depth path (wy == 0: y1 == y and
    dy == 0, so the vertical stage of warp_image_mxu is the identity)."""
    x1, x2, y1, y2, dx, dy, mask = coeffs
    b, c, h, w = src.shape
    xin = jax.lax.broadcasted_iota(jnp.int32, (b, h, w, w), 2)   # (b,y,x,X)
    dxe = dx[:, :, None]
    A = (jnp.where(xin == x1[:, :, None], 1.0 - dxe, 0.0)
         + jnp.where(xin == x2[:, :, None], dxe, 0.0))
    out = jnp.einsum("bcyx,byxX->bcyX", src, A,
                     precision=jax.lax.Precision.HIGHEST)
    return out, mask


_BANDED_WARP_R = 16   # displacement band: valid when |floor(w)| <= R
_BANDED_WARP_R_SMALL = 4   # tight first-try band (see warp_image_batched)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_warp_bb(b: int, c: int, h: int, w: int, r: int,
                  horiz_only: bool):
    """Batch block + weight-precompute mode + row tile for the fused
    banded-warp kernel (warp_image_banded_pallas), or None when not even
    a one-pair minimum-row-tile working set fits the VMEM budget (then
    the caller keeps the XLA banded / MXU routing). Returns
    (bb, inline_weights, rt) — rt=0 is the whole-frame kernel; rt>0
    row-tiles big levels (op-3 L1, op-4 L0) that round 3 previously sent
    to the XLA banded form (~5x off its bandwidth bound at full res)."""
    import os
    if os.environ.get("OF_DIS_TPU_NO_WARP_KERNEL"):
        return None
    nsh = 2 * r + 2
    h8 = _round_up(h, 8)
    w128 = _round_up(w, 128)
    # below ~6K padded px/pair the MXU one-hot warp is at parity or faster
    # (measured op-2 L4 (28,64): MXU fusion 0.54ms vs kernel+cond 0.62ms
    # per 384-pair batch; L3 (56,128): 2.03ms vs 0.87ms) — keep small
    # levels on the MXU route
    if h8 * w128 < int(os.environ.get("OF_DIS_TPU_WARP_KERNEL_MIN_PX",
                                      "6144")):
        return None
    hp8 = h8 if horiz_only else _round_up(h + nsh, 8)
    wpr = _round_up(w + nsh, 128)
    from of_dis_tpu.ops.patch_solver import _vmem_cap
    # Mosaic's stack peak measured ~2.5x this estimate (the unrolled
    # roll/crop temporaries of the j loop all stay live); the 6MB cap on
    # the ESTIMATE keeps the real peak under the 16MB VMEM stack
    # (measured: op-2 finest level 3.26MB/pair real, bb=4 -> 13M, fits)
    cap = _vmem_cap(6 * 1024 * 1024)
    rt_min = _round_up(nsh, 8)
    for rt in (0, 64, 48, 32, 24, 16, rt_min):
        if rt and (rt < rt_min or rt >= h8):
            continue
        if rt:
            rows_s = rt if horiz_only else 2 * rt    # src rows in VMEM
            unit = rt * w128 * 4
        else:
            rows_s = hp8
            unit = h8 * w128 * 4
        a = c * rows_s * wpr * 4
        for inline in (False, True):
            # the rolled-slab temporaries carry the channel dim (measured:
            # noc=3 at (56,128) peaks ~10MB/pair where the c-less estimate
            # said 3.1 — the g/out accumulators and roll scratch are all
            # (bb, c, rows, w128))
            per = nsh * (a + 2 * c * unit) + (0 if inline else nsh * unit)
            for cand in (8, 4, 2, 1) if not rt else (1,):
                if b % cand == 0 and cand * per < cap:
                    return cand, inline, rt
    return None


def warp_image_banded_pallas(src: jnp.ndarray, wx: jnp.ndarray,
                             wy: jnp.ndarray, r: int, bb: int,
                             horiz_only: bool = False,
                             inline_weights: bool = False,
                             rt: int = 0):
    """warp_image_banded as ONE fused Pallas kernel (plus the in-bounds
    mask): the (2r+2)^2 shifted-slab passes run entirely in VMEM.

    The XLA form of the banded warp materializes every weighted pass
    through HBM-visible fusions — at op-2 level sizes XLA routes to the
    MXU one-hot warp instead, whose inline-A einsum fusions cost ~2.7 ms
    of a 28 ms 384-pair batch (device profile, round 3). In-kernel the
    same math is pure VPU: shifts are pltpu.roll on the padded block
    (wrapped-in lanes/rows land outside the [h, w) crop, never read),
    weights are the same two-corner compare selects, and the
    accumulation order (k outer, j inner, ascending) matches
    warp_image_banded bit for bit. Replicate-padded borders reproduce
    the reference's clamped-index sampling (opticalflow_aux.c:43-54)
    for in-band displacements, exactly like the XLA banded form.

    rt > 0 ROW-TILES the kernel for levels whose whole frame busts VMEM
    (op-3 L1, op-4 L0): the grid gains a row-block axis of rt output
    rows (8-aligned, rt >= nsh so that TWO consecutive rt-row source
    blocks — passed as two BlockSpecs, no manual DMA — cover the
    [y, y + nsh) halo of every output row in the block). Weights, rolls
    and accumulation are per-block, bit-identical to the untiled form.

    src (B,C,H,W) f32; wx/wy (B,H,W). Returns (out (B,C,H,W), mask
    (B,H,W)) — mask per opticalflow_aux.c:38-42.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, c, h, w = src.shape
    nsh = 2 * r + 2
    h8 = _round_up(h, 8)
    w128 = _round_up(w, 128)
    sp = jnp.pad(src, ((0, 0), (0, 0),
                       (0, 0) if horiz_only else (r + 1, r + 1),
                       (r + 1, r + 1)), mode="edge")
    assert rt == 0 or (rt % 8 == 0 and (horiz_only or rt >= nsh)), rt
    nrb = 1 if not rt else -(-h8 // rt)
    if rt:
        # rows padded so the (ri+1)-th source block of the last program
        # exists (vertical case reads two consecutive rt-row blocks)
        hp8 = nrb * rt + (0 if horiz_only else rt)
    else:
        hp8 = _round_up(sp.shape[2], 8) if not horiz_only else h8
    wpr = _round_up(sp.shape[3], 128)
    sp = jnp.pad(sp, ((0, 0), (0, 0), (0, hp8 - sp.shape[2]),
                      (0, wpr - sp.shape[3])))
    hf8 = nrb * rt if rt else h8      # padded field/output rows
    wxp = jnp.pad(wx, ((0, 0), (0, hf8 - h), (0, w128 - w)))
    wyp = jnp.pad(wy, ((0, 0), (0, hf8 - h), (0, w128 - w)))
    hb = rt if rt else h8             # output rows per program
    hs = 2 * rt if (rt and not horiz_only) else hp8  # src rows in VMEM

    def kernel(*refs):
        if rt and not horiz_only:
            sp_ref, sp2_ref, wx_ref, wy_ref, out_ref, mask_ref = refs
        else:
            sp_ref, wx_ref, wy_ref, out_ref, mask_ref = refs
        wxv = wx_ref[:]
        wyv = wy_ref[:]
        row0 = (pl.program_id(1) * rt) if rt else 0
        gy = (jax.lax.broadcasted_iota(jnp.int32, wxv.shape, 1)
              + row0).astype(jnp.float32)
        gx = jax.lax.broadcasted_iota(jnp.int32, wxv.shape,
                                      2).astype(jnp.float32)
        xx = gx + wxv
        yy = gy + wyv
        mask_ref[:] = ((xx >= 0) & (xx <= w - 1) & (yy >= 0)
                       & (yy <= h - 1)).astype(jnp.float32)
        xx0 = jnp.floor(wxv)
        dxf = (wxv - xx0)[:, None]                   # (bb,1,hb,w128)
        x0i = xx0.astype(jnp.int32)[:, None]

        def wx_j(j):
            # shift j reads source column x + (j - (r+1)); the (1-dx)
            # corner lands on x0, dx on x0+1 (same as warp_image_banded)
            return ((1.0 - dxf) * (x0i == (j - r - 1)).astype(jnp.float32)
                    + dxf * (x0i == (j - r - 2)).astype(jnp.float32))

        wxw = None if inline_weights else [wx_j(j) for j in range(nsh)]

        def xsum(slab):                              # slab (bb,c,hb,wpr)
            g = jnp.zeros((bb, c, hb, w128), jnp.float32)
            for j in range(nsh):
                sh = pltpu.roll(slab, (wpr - j) % wpr, 3)[:, :, :, :w128]
                g = g + (wx_j(j) if inline_weights else wxw[j]) * sh
            return g

        if horiz_only:
            out_ref[:] = xsum(sp_ref[:])
            return

        yy0 = jnp.floor(wyv)
        dyf = (wyv - yy0)[:, None]
        y0i = yy0.astype(jnp.int32)[:, None]
        if rt:
            s_all = jnp.concatenate([sp_ref[:], sp2_ref[:]], axis=2)
        else:
            s_all = sp_ref[:]
        out = jnp.zeros((bb, c, hb, w128), jnp.float32)
        for k in range(nsh):
            sk = pltpu.roll(s_all, (hs - k) % hs, 2)[:, :, :hb, :]
            wyk = ((1.0 - dyf) * (y0i == (k - r - 1)).astype(jnp.float32)
                   + dyf * (y0i == (k - r - 2)).astype(jnp.float32))
            out = out + wyk * xsum(sk)
        out_ref[:] = out

    if rt:
        grid = (b // bb, nrb)
        spc = pl.BlockSpec((bb, c, rt, wpr), lambda i, j: (i, 0, j, 0),
                           memory_space=pltpu.VMEM)
        spc2 = pl.BlockSpec((bb, c, rt, wpr),
                            lambda i, j: (i, 0, j + 1, 0),
                            memory_space=pltpu.VMEM)
        fld = pl.BlockSpec((bb, rt, w128), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
        outc = pl.BlockSpec((bb, c, rt, w128), lambda i, j: (i, 0, j, 0),
                            memory_space=pltpu.VMEM)
        in_specs = ([spc, fld, fld] if horiz_only
                    else [spc, spc2, fld, fld])
    else:
        grid = (b // bb,)
        spc = pl.BlockSpec((bb, c, hp8, wpr), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
        fld = pl.BlockSpec((bb, h8, w128), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
        outc = pl.BlockSpec((bb, c, h8, w128), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
        in_specs = [spc, fld, fld]
    operands = ((sp, sp, wxp, wyp) if (rt and not horiz_only)
                else (sp, wxp, wyp))
    out, mask = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(jax.ShapeDtypeStruct((b, c, hf8, w128), jnp.float32),
                   jax.ShapeDtypeStruct((b, hf8, w128), jnp.float32)),
        in_specs=in_specs,
        out_specs=(outc, fld),
    )(*operands)
    return out[:, :, :h, :w], mask[:, :h, :w]


def _banded_warp_valid(wx, wy, r, horiz_only=False):
    """True when every displacement's integer part lies in the band
    (shift offsets k-(r+1) span [-(r+1), r]; floor in [-r, r-2] leaves a
    one-step margin on both sides)."""
    x0 = jnp.floor(wx)
    ok = (x0 >= -r) & (x0 <= r - 2)
    if not horiz_only:
        y0 = jnp.floor(wy)
        ok &= (y0 >= -r) & (y0 <= r - 2)
    return jnp.all(ok)


def warp_image_banded(src: jnp.ndarray, wx: jnp.ndarray, wy: jnp.ndarray,
                      r: int = _BANDED_WARP_R, horiz_only: bool = False):
    """Gather-free banded bilinear backward warp for large levels.

    XLA:TPU gathers cost ~10 cycles/element (11.6 ms per corner at op-3 L1,
    batch 8) and the MXU one-hot warp's operands grow O(W^2 + H^2) per
    pixel. When displacements are banded (|floor(w)| <= r — true after
    coarse-to-fine init for every real flow; the caller cond-falls-back
    otherwise), the warp is a (2r+2)x(2r+2) shifted-slab weighted sum:

        out = sum_k wy_k * sum_j wx_j * shift(src, k-r, j-r)

    where wx_j/wy_k are the per-pixel bilinear weights selecting the <=2
    nonzero shifts of each axis. Pure elementwise XLA: ~0.3 ms/pair at
    op-3 L1 vs 5.8 ms/pair of gathers. Edge-replicated padding reproduces
    the reference's clamped-index borders (opticalflow_aux.c:43-54) for
    in-band displacements. src (B,C,H,W); wx/wy (B,H,W).
    """
    b, c, h, w = src.shape
    nsh = 2 * r + 2
    xx0 = jnp.floor(wx)
    dxf = (wx - xx0)[:, None]                       # (B,1,H,W)
    x0i = xx0.astype(jnp.int32)[:, None]

    # Shift j reads padded column X + j == source column X + (j - (r+1)):
    # the (1-dx) corner lands on x0 (j = x0 + r + 1), dx on x0+1. Weights
    # are computed inline per term — a stacked (nsh,B,1,H,W) weight tensor
    # costs ~6.7 ms of HBM traffic at op-3 L1 batch 8; the inline compares
    # fuse into the slab-sum pass for free.
    def wx_j(j):
        return ((1.0 - dxf) * (x0i == (j - r - 1)).astype(jnp.float32)
                + dxf * (x0i == (j - r - 2)).astype(jnp.float32))

    sp = jnp.pad(src, ((0, 0), (0, 0),
                       (0, 0) if horiz_only else (r + 1, r + 1),
                       (r + 1, r + 1)), mode="edge")

    if horiz_only:
        out = jnp.zeros_like(src)
        for j in range(nsh):
            out = out + wx_j(j) * jax.lax.slice(
                sp, (0, 0, 0, j), (b, c, h, j + w))
        return out

    yy0 = jnp.floor(wy)
    dyf = (wy - yy0)[:, None]
    y0i = yy0.astype(jnp.int32)[:, None]

    def step(acc, k):
        slab = jax.lax.dynamic_slice(sp, (0, 0, k, 0),
                                     (b, c, h, w + nsh))
        g = jnp.zeros_like(src)
        for j in range(nsh):
            g = g + wx_j(j) * jax.lax.slice(slab, (0, 0, 0, j),
                                            (b, c, h, j + w))
        wyk = ((1.0 - dyf) * (y0i == (k - r - 1)).astype(jnp.float32)
               + dyf * (y0i == (k - r - 2)).astype(jnp.float32))
        return acc + wyk * g, None

    out, _ = jax.lax.scan(step, jnp.zeros_like(src),
                          jnp.arange(nsh, dtype=jnp.int32))
    return out


def warp_image_batched(src: jnp.ndarray, wx: jnp.ndarray, wy: jnp.ndarray,
                       use_pallas: bool, bb: int, horiz_only: bool = False):
    """Batched bilinear backward warp: src (B,C,H,W); wx/wy (B,H,W).

    On TPU (use_pallas), the primary path is the fused banded Pallas
    kernel (warp_image_banded_pallas, r=4): one VPU kernel, valid when
    every displacement's integer part is in-band — always, for real
    coarse-to-fine flows. Out-of-band content falls back per runtime
    lax.cond: small levels to the gather-free MXU one-hot path
    (warp_image_mxu / warp_image_mxu_h, exact to ~1e-5 at any
    displacement), larger levels to the r=16 XLA banded form and then
    quantized packed-pair gathers (_warp_gather_packed). Levels too big
    for the kernel's VMEM budget keep the XLA MXU/banded routing below.
    """
    if use_pallas:
        b_, c_, h_, w_ = src.shape
        pick = _pick_warp_bb(b_, c_, h_, w_, _BANDED_WARP_R_SMALL,
                             horiz_only)
        if pick is not None:
            bbw, inline_w, rt_w = pick
            small = _use_mxu_warp(b_, c_, h_, w_, horiz_only)

            def happy(_):
                return warp_image_banded_pallas(
                    src, wx, wy, _BANDED_WARP_R_SMALL, bbw,
                    horiz_only=horiz_only, inline_weights=inline_w,
                    rt=rt_w)

            def fallback(_):
                coeffs = _warp_coeffs(wx, wy)
                if small:
                    if horiz_only:
                        return warp_image_mxu_h(src, coeffs)
                    return warp_image_mxu(src, coeffs)
                return jax.lax.cond(
                    _banded_warp_valid(wx, wy, _BANDED_WARP_R, horiz_only),
                    lambda __: (warp_image_banded(src, wx, wy,
                                                  _BANDED_WARP_R,
                                                  horiz_only=horiz_only),
                                coeffs[-1]),
                    lambda __: (_warp_gather_packed(src, wx, wy, coeffs),
                                coeffs[-1]),
                    operand=None)

            return jax.lax.cond(
                _banded_warp_valid(wx, wy, _BANDED_WARP_R_SMALL,
                                   horiz_only),
                happy, fallback, operand=None)

    if use_pallas and _use_mxu_warp(src.shape[0], src.shape[1],
                                    src.shape[2], src.shape[3], horiz_only):
        # the fused coeffs kernel's (bbc,H,W) blocks x 9 fields must fit
        # the 16MB VMEM stack (measured 18.6M OOM at op-4 L0 with bbc=1):
        # shrink the batch block independently of the TV kernel's, falling
        # back to XLA's fused chain when even one pair's field doesn't fit
        from of_dis_tpu.ops.patch_solver import _vmem_cap
        h_, w_ = wx.shape[-2], wx.shape[-1]
        b_ = wx.shape[0]
        coeffs_cap = _vmem_cap(12 * 1024 * 1024)
        bbc = min(bb if bb > 0 else 1, b_)
        while bbc > 1 and bbc * h_ * w_ * 4 * 9 * 2 >= coeffs_cap:
            bbc -= 1
        while b_ % bbc:
            bbc -= 1
        if h_ * w_ * 4 * 9 * 2 < coeffs_cap:
            coeffs = _warp_coeffs_pallas(wx, wy, bbc)
        else:
            coeffs = _warp_coeffs(wx, wy)
        if horiz_only:
            return warp_image_mxu_h(src, coeffs)
        return warp_image_mxu(src, coeffs)

    if use_pallas:
        # large levels: banded shifted-slab warp when displacements fit the
        # band, gathers otherwise. The slab sum costs O((2r+2)^2) masked
        # elementwise passes, so the radius cascades at runtime: the tight
        # r=4 band (100 passes) covers typical fine-level flows (~10x
        # cheaper than r=16's 1156 — ~5 ms/level at op-3 L1 batch 8),
        # r=16 catches large-motion content, and only truly wild fields
        # pay the gather. Only the in-bounds mask is computed on the happy
        # path — the full corner/weight coefficients are needed only by
        # the gather branch, which builds them itself when (rarely) taken.
        r_small = _BANDED_WARP_R_SMALL
        r = _BANDED_WARP_R
        mask = _warp_coeffs(wx, wy)[-1]
        out = jax.lax.cond(
            _banded_warp_valid(wx, wy, r_small, horiz_only),
            lambda _: warp_image_banded(src, wx, wy, r_small,
                                        horiz_only=horiz_only),
            lambda _: jax.lax.cond(
                _banded_warp_valid(wx, wy, r, horiz_only),
                lambda __: warp_image_banded(src, wx, wy, r,
                                             horiz_only=horiz_only),
                lambda __: _warp_gather_packed(src, wx, wy,
                                               _warp_coeffs(wx, wy)),
                operand=None),
            operand=None)
        return out, mask

    coeffs = _warp_coeffs(wx, wy)
    x1, x2, y1, y2, dx, dy, mask = coeffs
    c = src.shape[1]
    dxe = dx[:, None]
    dye = dy[:, None]

    def one(s, iy_, ix_):
        # per-channel 2D gathers: the extra leading C dim switches
        # XLA:TPU to a ~10x slower gather lowering
        return jnp.stack([s[ch][iy_, ix_] for ch in range(c)], 0)

    v11 = jax.vmap(one)(src, y1, x1)
    v12 = jax.vmap(one)(src, y1, x2)
    v21 = jax.vmap(one)(src, y2, x1)
    v22 = jax.vmap(one)(src, y2, x2)

    out = (v11 * (1 - dxe) * (1 - dye) + v12 * dxe * (1 - dye)
           + v21 * (1 - dxe) * dye + v22 * dxe * dye)
    return out, mask


def _warp_gather_packed(src, wx, wy, coeffs):
    """TPU gather fallback: TWO int32 gathers of vertically-packed 16-bit
    pairs P[y,x] = (q16(src[y,x]), q16(src[min(y+1,H-1),x])) with a dynamic
    per-batch scale. Quantization error <= 0.5*max|src|/65535 (~0.002 on a
    0..255 scale). Exactness at the top edge is preserved by zeroing dy
    where floor(y+wy) < 0 (both corners then read row 0, reproducing the
    reference's index clamp)."""
    x1, x2, y1, y2, dx, dy, mask = coeffs
    c = src.shape[1]
    dxe = dx[:, None]
    gy = jax.lax.broadcasted_iota(jnp.float32, wy.shape, wy.ndim - 2)
    y0f = jnp.floor(gy + wy)
    dy = jnp.where(y0f < 0, 0.0, dy)   # top-edge clamp via the weight
    scale = 65535.0 / jnp.maximum(jnp.max(src), 1e-6)
    q = jnp.round(src * scale).astype(jnp.uint32)
    down = _nbr(src, -2, 1, zero=False)
    qd = jnp.round(down * scale).astype(jnp.uint32)
    packed = (q | (qd << 16)).astype(jnp.uint32)

    def onep(s, iy_, ix_):
        return jnp.stack([s[ch][iy_, ix_] for ch in range(c)], 0)

    g1 = jax.vmap(onep)(packed, y1, x1)
    g2 = jax.vmap(onep)(packed, y1, x2)
    inv = 1.0 / scale

    def unpack(g):
        lo = (g & jnp.uint32(0xFFFF)).astype(jnp.float32) * inv
        hi = (g >> 16).astype(jnp.float32) * inv
        return lo, hi

    v11, v21 = unpack(g1)
    v12, v22 = unpack(g2)

    dye = dy[:, None]
    out = (v11 * (1 - dxe) * (1 - dye) + v12 * dxe * (1 - dye)
           + v21 * (1 - dxe) * dye + v22 * dxe * dye)
    return out


# ----------------------------------------------------- derivative filters

# When True, the shift helpers below are being traced inside a Pallas TPU
# kernel: Mosaic cannot lower sub-tile concatenates, so shifts become
# pltpu.roll + iota masks there. Set only around kernel-body tracing.
_PALLAS_MODE = False


def _edge_pad(x: jnp.ndarray, axis: int, lo: int, hi: int) -> jnp.ndarray:
    """Replicate-pad via explicit concatenation (jnp.pad's edge mode creates
    zero-size intermediates that Mosaic rejects inside Pallas kernels)."""
    idx_lo = [slice(None)] * x.ndim
    idx_lo[axis] = slice(0, 1)
    idx_hi = [slice(None)] * x.ndim
    idx_hi[axis] = slice(x.shape[axis] - 1, None)
    parts = [x[tuple(idx_lo)]] * lo + [x] + [x[tuple(idx_hi)]] * hi
    return jnp.concatenate(parts, axis)


def _zero_pad(x: jnp.ndarray, axis: int, lo: int, hi: int) -> jnp.ndarray:
    """Zero-pad via explicit concatenation (Pallas/Mosaic-safe)."""
    shape_lo = list(x.shape)
    shape_lo[axis] = lo
    shape_hi = list(x.shape)
    shape_hi[axis] = hi
    parts = []
    if lo:
        parts.append(jnp.zeros(shape_lo, x.dtype))
    parts.append(x)
    if hi:
        parts.append(jnp.zeros(shape_hi, x.dtype))
    return jnp.concatenate(parts, axis) if len(parts) > 1 else x


def _nbr(x: jnp.ndarray, axis: int, k: int, zero: bool = True) -> jnp.ndarray:
    """out[i] = x[i+k] along `axis`; out-of-range reads give 0 (zero=True)
    or the clamped edge value (zero=False, |k|==1 only).

    Dual lowering: concat-of-slices for XLA; pltpu.roll + iota mask inside
    Pallas kernels (sub-tile concatenation is unsupported by Mosaic).
    """
    n = x.shape[axis]
    if _PALLAS_MODE:
        from jax.experimental.pallas import tpu as pltpu
        # pltpu.roll and broadcasted_iota require non-negative axes
        y = pltpu.roll(x, (-k) % n, axis % x.ndim)
        idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis % x.ndim)
        valid = (idx + k >= 0) & (idx + k < n)
        if zero:
            return jnp.where(valid, y, 0.0)
        assert abs(k) == 1, "clamped shift only needed for |k|=1 in-kernel"
        return jnp.where(valid, y, x)  # the single OOB line clamps to itself
    take = [slice(None)] * x.ndim
    take[axis] = slice(k, None) if k >= 0 else slice(None, n + k)
    body = x[tuple(take)]
    pad = _zero_pad if zero else _edge_pad
    if k >= 0:
        return pad(body, axis, 0, k)
    return pad(body, axis, -k, 0)


def _d5(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """5-tap derivative [1,-8,0,8,-1]/12 along `axis`, replicate border
    (the reference's anti-symmetric order-2 filter, refine_variational.cpp:45-46,
    applied with clamped borders by convolve_*_fast_5, image.cpp:578-624)."""
    p = _edge_pad(x, axis, 2, 2)

    def sl(o):
        idx = [slice(None)] * x.ndim
        n = x.shape[axis]
        idx[axis] = slice(o, o + n)
        return p[tuple(idx)]

    return (sl(0) - 8.0 * sl(1) + 8.0 * sl(3) - sl(4)) * (1.0 / 12.0)


def _d3(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """3-tap central difference [-0.5,0,0.5], replicate border (the flow
    derivative filter, refine_variational.cpp:47-48)."""
    return 0.5 * (_nbr(x, axis, 1, zero=False) - _nbr(x, axis, -1, zero=False))


def get_derivatives(im1: jnp.ndarray, w_im2: jnp.ndarray):
    """Spatio-temporal derivatives on the mean of im1 and the warped im2
    (get_derivatives, opticalflow_aux.c:78-132). Inputs (C,H,W).

    Returns (Ix, Iy, Iz, Ixx, Ixy, Iyy, Ixz, Iyz), each (C,H,W)."""
    tmp = 0.5 * (im1 + w_im2)
    iz = w_im2 - im1
    ix = _d5(tmp, 2)
    iy = _d5(tmp, 1)
    ixx = _d5(ix, 2)
    ixy = _d5(ix, 1)
    iyy = _d5(iy, 1)
    ixz = _d5(iz, 2)
    iyz = _d5(iz, 1)
    return ix, iy, iz, ixx, ixy, iyy, ixz, iyz


# ----------------------------------------------------------- smoothness

def compute_smoothness(uu: jnp.ndarray, vv: jnp.ndarray, quarter_alpha: float
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """TV diffusivity -> horizontal/vertical edge weights
    (compute_smoothness, opticalflow_aux.c:138-187). uu/vv (H,W).

    dst_horiz[j,i] couples (j,i)<->(j,i+1); last column is zero.
    dst_vert[j,i] couples (j,i)<->(j+1,i); last row is zero."""
    ux = _d3(uu, -1)
    uy = _d3(uu, -2)
    vx = _d3(vv, -1)
    vy = _d3(vv, -2)
    s = quarter_alpha / jnp.sqrt(EPS_SMOOTH + ux * ux + uy * uy
                                 + vx * vx + vy * vy)
    h, w = s.shape[-2], s.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, s.ndim - 1)
    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, s.ndim - 2)
    horiz = jnp.where(col < w - 1, s + _nbr(s, -1, 1), 0.0)
    vert = jnp.where(row < h - 1, s + _nbr(s, -2, 1), 0.0)
    return horiz, vert


def sub_laplacian(b: jnp.ndarray, src: jnp.ndarray, wh: jnp.ndarray,
                  wv: jnp.ndarray) -> jnp.ndarray:
    """b += div(w * grad(src)) flux update (sub_laplacian,
    opticalflow_aux.c:194-223). All (H,W).

    Full-width fluxes: wh/wv have zeroed last col/row (compute_smoothness),
    so the flux at the boundary is already zero."""
    th = wh * (_nbr(src, -1, 1) - src)             # (..., H, W), last col 0
    b = b + th - _nbr(th, -1, -1)
    tv = wv * (_nbr(src, -2, 1) - src)             # (..., H, W), last row 0
    b = b + tv - _nbr(tv, -2, -1)
    return b


# ------------------------------------------------------------ data term

def compute_data_gray(mask, du, dv, I, half_delta_over3, half_gamma_over3):
    """Robust data term, single-channel (compute_data, opticalflow_aux.c:
    408-594, SELECTCHANNEL==1 path, including the x3 system scaling that
    matches smoothing parameters between gray and RGB, lines 572-578).

    I = (ix, iy, iz, ixx, ixy, iyy, ixz, iyz) with channel dim squeezed.
    Returns (a11, a12, a22, b1, b2)."""
    ix, iy, iz, ixx, ixy, iyy, ixz, iyz = [c[0] for c in I]
    zero = jnp.zeros_like(mask)
    a11 = zero
    a12 = zero
    a22 = zero
    b1 = zero
    b2 = zero
    if half_delta_over3:  # color constancy
        t2 = iz + ix * du + iy * dv
        n1 = DATANORM + ix * ix + iy * iy
        tsum = t2 * t2 / n1
        t = mask * half_delta_over3 / jnp.sqrt(EPS_COLOR + 3.0 * tsum)
        t3 = t / n1
        tx = t3 * ix
        ty = t3 * iy
        a11 = a11 + tx * ix
        a12 = a12 + tx * iy
        a22 = a22 + ty * iy
        b1 = b1 - tx * iz
        b2 = b2 - ty * iz
    # gradient constancy
    t2 = ixz + ixx * du + ixy * dv
    t3 = iyz + ixy * du + iyy * dv
    xy2 = ixy * ixy
    n1 = xy2 + DATANORM + ixx * ixx
    n2 = xy2 + DATANORM + iyy * iyy
    tsum = t2 * t2 / n1 + t3 * t3 / n2
    t = mask * half_gamma_over3 / jnp.sqrt(EPS_GRAD + 3.0 * tsum)
    tn2 = t / n2
    tn1 = t / n1
    a12 = a12 + (tn1 * ixx + tn2 * iyy) * ixy
    b1 = b1 - tn1 * ixx * ixz - tn2 * ixy * iyz
    b2 = b2 - tn2 * iyy * iyz - tn1 * ixy * ixz
    a11 = a11 + tn1 * ixx * ixx + tn2 * xy2
    a22 = a22 + tn2 * iyy * iyy + tn1 * xy2
    return 3.0 * a11, 3.0 * a12, 3.0 * a22, 3.0 * b1, 3.0 * b2


def compute_data_rgb(mask, du, dv, I, half_delta_over3, half_gamma_over3):
    """Robust data term, RGB (compute_data, opticalflow_aux.c:408-594,
    SELECTCHANNEL==3 path). Replicates two upstream quirks for bit-parity
    with the run_OF_RGB binary:
      1. the channel-1 color-term accumulation loads Iy of channel 2
         (opticalflow_aux.c:496),
      2. the gradient-term normalization `tmp` is overwritten (not
         accumulated) per channel, so only channel 3's residuals shape the
         robust weight (opticalflow_aux.c:529, 538)."""
    ix, iy, iz, ixx, ixy, iyy, ixz, iyz = I  # each (3,H,W)
    zero = jnp.zeros_like(mask)
    a11 = zero
    a12 = zero
    a22 = zero
    b1 = zero
    b2 = zero
    if half_delta_over3:
        n = [DATANORM + ix[c] * ix[c] + iy[c] * iy[c] for c in range(3)]
        tsum = zero
        for c in range(3):
            t2 = iz[c] + ix[c] * du + iy[c] * dv
            tsum = tsum + t2 * t2 / n[c]
        t = mask * half_delta_over3 / jnp.sqrt(EPS_COLOR + tsum)
        for c, iy_used in ((2, iy[2]), (1, iy[1]), (0, iy[1])):  # quirk 1
            t3 = t / n[c]
            tx = t3 * ix[c]
            ty = t3 * iy_used
            a11 = a11 + tx * ix[c]
            a12 = a12 + tx * iy_used
            a22 = a22 + ty * iy_used
            b1 = b1 - tx * iz[c]
            b2 = b2 - ty * iz[c]
    # gradient term: robust weight from channel 3 only (quirk 2)
    nx = [ixy[c] * ixy[c] + DATANORM + ixx[c] * ixx[c] for c in range(3)]
    ny = [ixy[c] * ixy[c] + DATANORM + iyy[c] * iyy[c] for c in range(3)]
    t2 = ixz[2] + ixx[2] * du + ixy[2] * dv
    t3 = iyz[2] + ixy[2] * du + iyy[2] * dv
    tsum = t2 * t2 / nx[2] + t3 * t3 / ny[2]
    t = mask * half_gamma_over3 / jnp.sqrt(EPS_GRAD + tsum)
    for c in (2, 1, 0):
        tn2 = t / ny[c]
        tn1 = t / nx[c]
        a12 = a12 + (tn1 * ixx[c] + tn2 * iyy[c]) * ixy[c]
        b1 = b1 - tn1 * ixx[c] * ixz[c] - tn2 * ixy[c] * iyz[c]
        b2 = b2 - tn2 * iyy[c] * iyz[c] - tn1 * ixy[c] * ixz[c]
        a11 = a11 + tn1 * ixx[c] * ixx[c] + tn2 * ixy[c] * ixy[c]
        a22 = a22 + tn2 * iyy[c] * iyy[c] + tn1 * ixy[c] * ixy[c]
    return a11, a12, a22, b1, b2


def compute_data_de_gray(mask, du, I, half_delta_over3, half_gamma_over3):
    """1-D depth data term, single channel (compute_data_DE,
    opticalflow_aux.c:601-747, SELECTCHANNEL==1 path incl. x3 scaling)."""
    ix, iy, iz, ixx, ixy, iyy, ixz, iyz = [c[0] for c in I]
    zero = jnp.zeros_like(mask)
    a11 = zero
    b1 = zero
    if half_delta_over3:
        t2 = iz + ix * du
        n1 = DATANORM + iy * iy + ix * ix
        tsum = t2 * t2 / n1
        t = mask * half_delta_over3 / jnp.sqrt(EPS_COLOR + 3.0 * tsum)
        tx = (t / n1) * ix
        a11 = a11 + tx * ix
        b1 = b1 - tx * iz
    xy2 = ixy * ixy + DATANORM
    n1 = xy2 + ixx * ixx
    n2 = xy2 + iyy * iyy
    t2y = iyz + ixy * du
    t2x = ixz + ixx * du
    tsum = t2y * t2y / n2 + t2x * t2x / n1
    t = mask * half_gamma_over3 / jnp.sqrt(EPS_GRAD + 3.0 * tsum)
    t2 = (t / n2) * ixy
    t3 = (t / n1) * ixx
    a11 = a11 + t3 * ixx + t2 * ixy
    b1 = b1 - t3 * ixz - t2 * iyz
    return 3.0 * a11, 3.0 * b1


def compute_data_de_rgb(mask, du, I, half_delta_over3, half_gamma_over3):
    """1-D depth data term, RGB (compute_data_DE, opticalflow_aux.c:601-747,
    SELECTCHANNEL==3 path; the robust gradient weight accumulates all
    channels here, unlike the flow variant)."""
    ix, iy, iz, ixx, ixy, iyy, ixz, iyz = I
    zero = jnp.zeros_like(mask)
    a11 = zero
    b1 = zero
    if half_delta_over3:
        n = [DATANORM + iy[c] * iy[c] + ix[c] * ix[c] for c in range(3)]
        tsum = zero
        for c in range(3):
            t2 = iz[c] + ix[c] * du
            tsum = tsum + t2 * t2 / n[c]
        t = mask * half_delta_over3 / jnp.sqrt(EPS_COLOR + tsum)
        for c in (2, 1, 0):
            tx = (t / n[c]) * ix[c]
            a11 = a11 + tx * ix[c]
            b1 = b1 - tx * iz[c]
    nx = [ixy[c] * ixy[c] + DATANORM + ixx[c] * ixx[c] for c in range(3)]
    ny = [ixy[c] * ixy[c] + DATANORM + iyy[c] * iyy[c] for c in range(3)]
    tsum = zero
    for c in range(3):
        t2y = iyz[c] + ixy[c] * du
        t2x = ixz[c] + ixx[c] * du
        tsum = tsum + t2y * t2y / ny[c] + t2x * t2x / nx[c]
    t = mask * half_gamma_over3 / jnp.sqrt(EPS_GRAD + tsum)
    for c in (2, 1, 0):
        t2 = (t / ny[c]) * ixy[c]
        t3 = (t / nx[c]) * ixx[c]
        a11 = a11 + t3 * ixx[c] + t2 * ixy[c]
        b1 = b1 - t3 * ixz[c] - t2 * iyz[c]
    return a11, b1


# ------------------------------------------------------------------- SOR

def _weight_shifts(wh: jnp.ndarray, wv: jnp.ndarray):
    """Iteration-invariant neighbor weights: (up_w, left_w, wsum)
    (the dpsis sums of solver.c:42-64). Boundary neighbors contribute zero
    via the zeroed last row/col of wv/wh and the zero-padded shifts."""
    up_w = _nbr(wv, -2, -1)
    left_w = _nbr(wh, -1, -1)
    wsum = up_w + left_w + wv + wh
    return up_w, left_w, wsum


def _neighbor_sum(x, wh, wv, up_w, left_w):
    """Sum of weighted 4-neighborhood values (sigma of solver.c:42-64)."""
    return (up_w * _nbr(x, -2, -1) + left_w * _nbr(x, -1, -1)
            + wv * _nbr(x, -2, 1) + wh * _nbr(x, -1, 1))


def sor_coupled_rb(du, dv, a11, a12, a22, b1, b2, wh, wv, iterations: int,
                   omega: float, row_parity=0):
    """Coupled 2x2 SOR on the 5-point stencil, red-black ordering.

    Per-pixel update identical to sor_coupled_slow_but_readable
    (solver.c:34-78): du then dv, dv using the freshly updated du. Red-black
    replaces the raster sweep (see module docstring). All iteration-invariant
    terms (neighbor weights, diagonal reciprocals) are hoisted out of the
    color steps.

    row_parity (static or traced int scalar) offsets the checkerboard's row
    colour: a row-sharded caller whose local block starts at an ODD global
    row passes 1 so the local colours coincide with the unsharded sweep's
    (parallel.spatial threads each shard's global row-origin parity here)."""
    ii = (jax.lax.broadcasted_iota(jnp.int32, du.shape, du.ndim - 2)
          + jax.lax.broadcasted_iota(jnp.int32, du.shape, du.ndim - 1))
    red = ((ii + row_parity) % 2 == 0)
    up_w, left_w, wsum = _weight_shifts(wh, wv)
    om_a11 = omega / (a11 + wsum)
    om_a22 = omega / (a22 + wsum)

    def one_color(carry, mask):
        du, dv = carry
        b1n = b1 + _neighbor_sum(du, wh, wv, up_w, left_w)
        b2n = b2 + _neighbor_sum(dv, wh, wv, up_w, left_w)
        du_new = (1.0 - omega) * du + om_a11 * (b1n - a12 * dv)
        du = jnp.where(mask, du_new, du)
        dv_new = (1.0 - omega) * dv + om_a22 * (b2n - a12 * du)
        dv = jnp.where(mask, dv_new, dv)
        return du, dv

    def body(_, carry):
        carry = one_color(carry, red)
        carry = one_color(carry, ~red)
        return carry

    du, dv = jax.lax.fori_loop(0, iterations, body, (du, dv))
    return du, dv


def sor_de_rb(du, a11, b1, wh, wv, iterations: int, omega: float,
              row_parity=0):
    """1-D depth SOR (sor_coupled_slow_but_readable_DE, solver.c:439-471),
    red-black ordering. row_parity as in sor_coupled_rb."""
    ii = (jax.lax.broadcasted_iota(jnp.int32, du.shape, du.ndim - 2)
          + jax.lax.broadcasted_iota(jnp.int32, du.shape, du.ndim - 1))
    red = ((ii + row_parity) % 2 == 0)
    up_w, left_w, wsum = _weight_shifts(wh, wv)
    om_a11 = omega / (a11 + wsum)

    def one_color(du, mask):
        b1n = b1 + _neighbor_sum(du, wh, wv, up_w, left_w)
        du_new = (1.0 - omega) * du + om_a11 * b1n
        return jnp.where(mask, du_new, du)

    def body(_, du):
        du = one_color(du, red)
        du = one_color(du, ~red)
        return du

    return jax.lax.fori_loop(0, iterations, body, du)


# ------------------------------------------------------------ level glue

# Fields resident in VMEM for the fused Pallas TV kernel: ~30 (H,W) planes
# (derivatives, system coefficients, weights, solver state). Levels whose
# working set exceeds this budget fall back to the pure-XLA path.
def _pallas_vmem_budget() -> int:
    # Read per call (not cached at import) so OF_DIS_TPU_VMEM_SCALE set after
    # importing this module still takes effect, matching patch_solver._vmem_cap
    # semantics.
    from of_dis_tpu.ops.patch_solver import _vmem_cap
    return _vmem_cap(12 * 1024 * 1024)


def _on_tpu() -> bool:
    import os
    if os.environ.get("OF_DIS_TPU_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _tv_nfields(noc: int) -> int:
    """(H, W) f32 fields resident per pair in the fused TV kernel. The +12
    RGB surcharge covers compute_data_rgb's per-channel temporaries —
    without it Mosaic's stack peaks ~1.7x the naive estimate and a
    (4, 112, 256) noc=3 block measured 17.78M against the 16M limit."""
    return 14 + 8 * noc + 8 + (12 if noc == 3 else 0)


def _use_pallas(h: int, w: int, noc: int) -> bool:
    return (_on_tpu()
            and h * w * 4 * _tv_nfields(noc) < _pallas_vmem_budget())


def _of_inner_loop(wx, wy, mask, I, *, noc, quarter_alpha, hd3, hg3,
                   n_inner, n_solver, omega):
    """The per-level fixed-point iteration of RefLevelOF
    (refine_variational.cpp:182-224), shared verbatim between the pure-XLA
    path and the Pallas kernel body. All fields (H, W); I entries (C, H, W)."""

    def inner(_, carry):
        du, dv, uu, vv = carry
        wh, wv = compute_smoothness(uu, vv, quarter_alpha)
        if noc == 1:
            a11, a12, a22, b1, b2 = compute_data_gray(mask, du, dv, I, hd3, hg3)
        else:
            a11, a12, a22, b1, b2 = compute_data_rgb(mask, du, dv, I, hd3, hg3)
        b1 = sub_laplacian(b1, wx, wh, wv)
        b2 = sub_laplacian(b2, wy, wh, wv)
        du, dv = sor_coupled_rb(du, dv, a11, a12, a22, b1, b2, wh, wv,
                                n_solver, omega)
        return du, dv, wx + du, wy + dv

    zero = jnp.zeros_like(wx)
    _, _, uu, vv = jax.lax.fori_loop(0, n_inner, inner,
                                     (zero, zero, wx, wy))
    return uu, vv


def _of_inner_pallas(wx, wy, mask, i_stack, *, noc, quarter_alpha, hd3, hg3,
                     n_inner, n_solver, omega):
    """Fused Pallas TPU kernel running the whole TV inner loop in VMEM.

    The pure-XLA path executes ~360 small elementwise ops per inner
    iteration on (H,W) fields; at the DIS scales those fields are tiny and
    per-op overhead dominates. Fusing the entire fixed-point loop into one
    kernel keeps every field resident in VMEM. i_stack: (8, C, H, W).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(wx_ref, wy_ref, mask_ref, i_ref, uu_ref, vv_ref):
        global _PALLAS_MODE
        i_fields = [i_ref[k] for k in range(8)]
        _PALLAS_MODE = True
        try:
            uu, vv = _of_inner_loop(
                wx_ref[:], wy_ref[:], mask_ref[:], i_fields, noc=noc,
                quarter_alpha=quarter_alpha, hd3=hd3, hg3=hg3,
                n_inner=n_inner, n_solver=n_solver, omega=omega)
        finally:
            _PALLAS_MODE = False
        uu_ref[:] = uu
        vv_ref[:] = vv

    out = jax.ShapeDtypeStruct(wx.shape, wx.dtype)
    return pl.pallas_call(
        kernel,
        out_shape=(out, out),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
    )(wx, wy, mask, i_stack)


def _pick_bb(batch: int, h: int, w: int, noc: int) -> int:
    """Largest divisor of `batch` whose (bB,H,W) working set fits VMEM.

    Small levels raise the block beyond the old cap of 8 until each
    vector op spans ~64K elements: at op-2's (28,64)/(14,32) levels the
    bb=8 kernels were instruction-count-bound, not VMEM-bound (batch-384
    device profile: the (28,64) TV kernel cost MORE than the 4x-larger
    (56,128) one)."""
    # VMEM residency is in (8,128)-padded vregs: a (14,32) field occupies
    # (16,128) — 8x its naive bytes (measured 17.1M stack at bb=64 vs the
    # 3.4M naive estimate)
    unit = _round_up(h, 8) * _round_up(w, 128) * 4
    cap = max(1, _pallas_vmem_budget() // (unit * _tv_nfields(noc)))
    target = max(8, min(64, -(-65536 // (h * w))))
    if target > 8:
        # wide-block regime: Mosaic's stack peaked ~1.44x even the padded
        # estimate at (14,32) bb=48 (16.94M vs the 16M limit) — shave the
        # cap rather than inflating every level's field count
        cap = max(1, cap * 2 // 3)
    bb = min(batch, cap, target)
    while batch % bb:
        bb -= 1
    return bb


def _of_inner_pallas_batched(wx, wy, mask, i_stack, *, bb, noc,
                             quarter_alpha, hd3, hg3, n_inner, n_solver,
                             omega):
    """Batched fused TV kernel: each grid program runs `bb` frame pairs.

    wx/wy/mask (B,H,W); i_stack (8,C,B,H,W). One pair per program wastes the
    VPU on tiny (H,W) fields and pays per-program overhead B times; blocking
    bb pairs gives each vector op bb*H*W elements.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w = wx.shape
    c = i_stack.shape[1]

    def kernel(wx_ref, wy_ref, mask_ref, i_ref, uu_ref, vv_ref):
        global _PALLAS_MODE
        i_fields = [i_ref[k] for k in range(8)]   # (C, bb, H, W)
        _PALLAS_MODE = True
        try:
            uu, vv = _of_inner_loop(
                wx_ref[:], wy_ref[:], mask_ref[:], i_fields, noc=noc,
                quarter_alpha=quarter_alpha, hd3=hd3, hg3=hg3,
                n_inner=n_inner, n_solver=n_solver, omega=omega)
        finally:
            _PALLAS_MODE = False
        uu_ref[:] = uu
        vv_ref[:] = vv

    fld = pl.BlockSpec((bb, h, w), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    istk = pl.BlockSpec((8, c, bb, h, w), lambda i: (0, 0, i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct(wx.shape, wx.dtype)
    return pl.pallas_call(
        kernel,
        grid=(b // bb,),
        out_shape=(out, out),
        in_specs=[fld, fld, fld, istk],
        out_specs=(fld, fld),
    )(wx, wy, mask, i_stack)


def ref_level_of_batched(wx, wy, im1, im2, *, alpha, gamma, delta, n_inner,
                         n_solver, omega):
    """Batched flow refinement: wx/wy (B,H,W), im1/im2 (B,C,H,W).

    Same math as ref_level_of; on TPU the inner loop runs as the fused
    Pallas kernel with several pairs per program."""
    b, noc, h, w = im1.shape
    quarter_alpha = 0.25 * alpha
    hd3 = delta * 0.5 / 3.0
    hg3 = gamma * 0.5 / 3.0
    pallas_ok = _use_pallas(h, w, noc)
    bb = _pick_bb(b, h, w, noc) if pallas_ok else 1
    # the warp's TPU formulations (MXU one-hot / banded slabs) don't depend
    # on whether the INNER loop's fused kernel fits VMEM — gate them on the
    # platform alone (big levels: pallas_ok False but gathers cost
    # ~10 cyc/elem, 46 ms per op-3 L1 8-batch)
    w_im2, mask = warp_image_batched(im2, wx, wy, _on_tpu(), bb)
    I = jax.vmap(get_derivatives)(im1, w_im2)      # 8 x (B,C,H,W)
    kw = dict(noc=noc, quarter_alpha=quarter_alpha, hd3=hd3, hg3=hg3,
              n_inner=n_inner, n_solver=n_solver, omega=omega)
    if pallas_ok:
        i_stack = jnp.stack(I, 0).transpose(0, 2, 1, 3, 4)   # (8,C,B,H,W)
        return _of_inner_pallas_batched(
            wx, wy, mask, i_stack, bb=bb, **kw)
    i_t = [f.transpose(1, 0, 2, 3) for f in I]               # (C,B,H,W)
    return _of_inner_loop(wx, wy, mask, i_t, **kw)


def _de_inner_pallas_batched(wx, mask, i_stack, *, bb, noc, camlr,
                             quarter_alpha, hd3, hg3, n_inner, n_solver,
                             omega):
    """Batched fused depth-TV kernel (see _of_inner_pallas_batched)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w = wx.shape
    c = i_stack.shape[1]

    def kernel(wx_ref, mask_ref, i_ref, uu_ref):
        global _PALLAS_MODE
        i_fields = [i_ref[k] for k in range(8)]
        _PALLAS_MODE = True
        try:
            uu = _de_inner_loop(
                wx_ref[:], mask_ref[:], i_fields, noc=noc, camlr=camlr,
                quarter_alpha=quarter_alpha, hd3=hd3, hg3=hg3,
                n_inner=n_inner, n_solver=n_solver, omega=omega)
        finally:
            _PALLAS_MODE = False
        uu_ref[:] = uu

    fld = pl.BlockSpec((bb, h, w), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    istk = pl.BlockSpec((8, c, bb, h, w), lambda i: (0, 0, i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b // bb,),
        out_shape=jax.ShapeDtypeStruct(wx.shape, wx.dtype),
        in_specs=[fld, fld, istk],
        out_specs=fld,
    )(wx, mask, i_stack)


def ref_level_de_batched(wx, im1, im2, *, alpha, gamma, delta, n_inner,
                         n_solver, omega, camlr: int):
    """Batched depth refinement: wx (B,H,W), im1/im2 (B,C,H,W)."""
    b, noc, h, w = im1.shape
    quarter_alpha = 0.25 * alpha
    hd3 = delta * 0.5 / 3.0
    hg3 = gamma * 0.5 / 3.0
    wy0 = jnp.zeros_like(wx)
    pallas_ok = _use_pallas(h, w, noc)
    bb = _pick_bb(b, h, w, noc) if pallas_ok else 1
    w_im2, mask = warp_image_batched(im2, wx, wy0, _on_tpu(), bb,
                                     horiz_only=True)
    I = jax.vmap(get_derivatives)(im1, w_im2)
    kw = dict(noc=noc, camlr=camlr, quarter_alpha=quarter_alpha, hd3=hd3,
              hg3=hg3, n_inner=n_inner, n_solver=n_solver, omega=omega)
    if pallas_ok:
        i_stack = jnp.stack(I, 0).transpose(0, 2, 1, 3, 4)
        return _de_inner_pallas_batched(
            wx, mask, i_stack, bb=bb, **kw)
    i_t = [f.transpose(1, 0, 2, 3) for f in I]
    return _de_inner_loop(wx, mask, i_t, **kw)


def ref_level_of(wx, wy, im1, im2, *, alpha, gamma, delta, n_inner,
                 n_solver, omega):
    """One level of flow refinement (RefLevelOF, refine_variational.cpp:
    152-247). im1/im2 (C,H,W) de-padded; wx/wy (H,W). Returns refined (wx, wy).

    Parameter pre-scaling follows refine_variational.cpp:40-43:
    quarter_alpha = alpha/4, half_delta_over3 = delta/6, half_gamma_over3 =
    gamma/6; beta (matching term) is fixed to 0."""
    noc = im1.shape[0]
    quarter_alpha = 0.25 * alpha
    hd3 = delta * 0.5 / 3.0
    hg3 = gamma * 0.5 / 3.0
    w_im2, mask = warp_image(im2, wx, wy)
    I = get_derivatives(im1, w_im2)
    kw = dict(noc=noc, quarter_alpha=quarter_alpha, hd3=hd3, hg3=hg3,
              n_inner=n_inner, n_solver=n_solver, omega=omega)
    h, w = wx.shape
    if _use_pallas(h, w, noc):
        return _of_inner_pallas(wx, wy, mask, jnp.stack(I, 0), **kw)
    return _of_inner_loop(wx, wy, mask, I, **kw)


def _de_inner_loop(wx, mask, I, *, noc, camlr, quarter_alpha, hd3, hg3,
                   n_inner, n_solver, omega):
    """The per-level fixed-point iteration of RefLevelDE
    (refine_variational.cpp:251-342), shared between XLA and Pallas paths."""
    wy0 = jnp.zeros_like(wx)

    def inner(_, carry):
        du, uu = carry
        wh, wv = compute_smoothness(uu, wy0, quarter_alpha)
        if noc == 1:
            a11, b1 = compute_data_de_gray(mask, du, I, hd3, hg3)
        else:
            a11, b1 = compute_data_de_rgb(mask, du, I, hd3, hg3)
        b1 = sub_laplacian(b1, wx, wh, wv)
        du = sor_de_rb(du, a11, b1, wh, wv, n_solver, omega)
        uu = wx + du
        if camlr == 0:
            uu = jnp.minimum(uu, 0.0)
        else:
            uu = jnp.maximum(uu, 0.0)
        return du, uu

    _, uu = jax.lax.fori_loop(0, n_inner, inner,
                              (jnp.zeros_like(wx), wx))
    return uu


def _de_inner_pallas(wx, mask, i_stack, *, noc, camlr, quarter_alpha, hd3,
                     hg3, n_inner, n_solver, omega):
    """Fused Pallas TPU kernel for the depth TV inner loop (see
    _of_inner_pallas). i_stack: (8, C, H, W)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(wx_ref, mask_ref, i_ref, uu_ref):
        global _PALLAS_MODE
        i_fields = [i_ref[k] for k in range(8)]
        _PALLAS_MODE = True
        try:
            uu = _de_inner_loop(
                wx_ref[:], mask_ref[:], i_fields, noc=noc, camlr=camlr,
                quarter_alpha=quarter_alpha, hd3=hd3, hg3=hg3,
                n_inner=n_inner, n_solver=n_solver, omega=omega)
        finally:
            _PALLAS_MODE = False
        uu_ref[:] = uu

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(wx.shape, wx.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(wx, mask, i_stack)


def ref_level_de(wx, im1, im2, *, alpha, gamma, delta, n_inner, n_solver,
                 omega, camlr: int):
    """One level of depth refinement (RefLevelDE, refine_variational.cpp:
    250-342). Disparity sign clamped per camera after each inner iteration
    (refine_variational.cpp:305-320)."""
    noc = im1.shape[0]
    quarter_alpha = 0.25 * alpha
    hd3 = delta * 0.5 / 3.0
    hg3 = gamma * 0.5 / 3.0
    wy0 = jnp.zeros_like(wx)
    w_im2, mask = warp_image(im2, wx, wy0)
    I = get_derivatives(im1, w_im2)
    kw = dict(noc=noc, camlr=camlr, quarter_alpha=quarter_alpha, hd3=hd3,
              hg3=hg3, n_inner=n_inner, n_solver=n_solver, omega=omega)
    h, w = wx.shape
    if _use_pallas(h, w, noc):
        return _de_inner_pallas(wx, mask, jnp.stack(I, 0), **kw)
    return _de_inner_loop(wx, mask, I, **kw)
