"""Densification: patch displacements -> dense flow, deterministic and
TPU-first (reference: PatGridClass::AggregateFlowDense, patchgrid.cpp:213-397).

The reference's optional OpenMP version data-races by design
(patchgrid.cpp:220-222, CMakeLists.txt:29-30); both paths here are
deterministic.

Two paths:
  - forward: each valid patch splats its displacement over its p x p integer
    footprint, weighted per-pixel by 1/max(minerrval, residual)
    (RGB: 1/sum_c max(minerrval, residual_c)) (patchgrid.cpp:223-275).
    Because the grid is regular, this is re-expressed as a *gather*: each
    pixel reads from its static set of covering patches (no scatter at all;
    see _axis_slots/aggregate_flow_dense).
  - backward merge ("fbcon"): the complementary grid's patches splat their
    NEGATED displacement bilinearly at their *converged* target position
    (patchgrid.cpp:278-375). Indices are runtime values, so this cannot use
    the static cover tables — instead the 4 corner splats combine into one
    (psz+1)^2 footprint placed by dynamic one-hot MXU contractions
    (deterministic; XLA scatter-add kept behind OF_DIS_TPU_SCATTER_FBCON=1,
    measured ~90x slower end-to-end on TPU at op-2).

Finally each pixel is normalized by its accumulated weight (patchgrid.cpp:377-394).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from of_dis_tpu.ops.patch_solver import PatchResult
from of_dis_tpu.params import DISParams, LevelSpec


def _pixel_weights(pweight: jnp.ndarray) -> jnp.ndarray:
    """(P,P,N) pre-clamped channel-summed denominators (built inside the
    solver backends: sum_c max(res_c, MINERRVAL), see PatchResult.pweight;
    patchgrid.cpp:253-260) -> per-pixel splat weight 1/den."""
    return 1.0 / pweight


def _axis_slots(size: int, n_axis: int, off: int, steps: int, psz: int):
    """Static per-coordinate contributor table along one axis.

    For each output coordinate v in [0, size): the (at most K) grid indices
    whose psz-wide footprint covers v, the within-patch offset, and validity.
    K = floor((psz-1)/steps)+1 is the tight upper bound on how many multiples
    of `steps` fit in a window of psz consecutive integers.

    Returns (idx (size,K) int32 clipped, offset (size,K) int32, valid (size,K)
    bool) — the TPU-friendly inverse of the reference's per-patch scatter
    (patchgrid.cpp:223-275): every pixel *gathers* from the patches covering
    it, so densification needs no scatter at all on the forward path.
    """
    k = (psz - 1) // steps + 1
    v = np.arange(size)
    # patch center c = i*steps + off covers v iff v - c + psz//2 in [0, psz)
    lo = v + psz // 2 - psz + 1 - off            # min center value
    i_min = -((-lo) // steps)                    # ceil division
    slots = i_min[:, None] + np.arange(k)[None, :]          # (size, K)
    centers = slots * steps + off
    offset = v[:, None] - centers + psz // 2
    valid = (slots >= 0) & (slots < n_axis) & (offset >= 0) & (offset < psz)
    idx = np.clip(slots, 0, n_axis - 1).astype(np.int32)
    offset = np.clip(offset, 0, psz - 1).astype(np.int32)
    return idx, offset, valid


def _cover_matrix(size: int, n_axis: int, off: int, steps: int, psz: int
                  ) -> np.ndarray:
    """(size, psz*n_axis) static 0/1 matrix: row v has a 1 at column
    offset*n_axis + idx for every grid slot covering output coordinate v
    (see _axis_slots). Densification along one axis is a contraction
    against this matrix."""
    idx, offset, valid = _axis_slots(size, n_axis, off, steps, psz)
    m = np.zeros((size, psz * n_axis), np.float32)
    for a in range(idx.shape[1]):
        rows = np.arange(size)[valid[:, a]]
        m[rows, offset[valid[:, a], a] * n_axis + idx[valid[:, a], a]] = 1.0
    return m


def aggregate_flow_dense(spec: LevelSpec, params: DISParams, res: PatchResult,
                         compl_res: Optional[PatchResult] = None) -> jnp.ndarray:
    """Dense flow (H, W, nop) from per-patch results (patchgrid.cpp:213-397).

    Forward path is scatter-free AND gather-free: the patch grid is
    regular, so pixel coverage is separable per axis — densification is
    two contractions U @ T @ V against static 0/1 cover matrices
    (see _cover_matrix), which run on the MXU. The reference's OpenMP
    scatter (which data-races, patchgrid.cpp:220-222) becomes a
    deterministic pair of matmuls. The backward (fbcon) merge splats at
    runtime-dependent converged positions and keeps the scatter-add
    formulation.
    """
    psz, nop = params.p_samp_s, params.nop
    hw = spec.height * spec.width
    h, w = spec.height, spec.width
    noph, nopw = spec.noph, spec.nopw

    u = jnp.asarray(_cover_matrix(h, noph, spec.offseth, spec.steps, psz))
    v = jnp.asarray(_cover_matrix(w, nopw, spec.offsetw, spec.steps, psz))

    # Contract directly against pixw's NATIVE axis order. (P,P,N) with the
    # column-major patch axis N = ix*noph + iy reshapes for free to
    # (oy, (ox,ix), iy); interleaving it into the (oy*iy, ox*ix) matrix the
    # plain mm form wants costs XLA a full relayout copy of each weight
    # map (~4 ms/batch-16 at the op-3 fine level, device profile r3).
    # dot_general contracts (oy, iy) jointly instead — no data movement.
    pixw = _pixel_weights(res.pweight)                  # (P,P,N)
    q_nat = pixw.reshape(psz, psz * nopw, noph)         # (oy, (ox,ix), iy)

    # weight map + the nop weighted-flow maps: one pair of dots PER FIELD.
    # The round-3 form concatenated the three fields along the (ox,ix)
    # axis to ride one big dot — but the concatenate materializes a
    # (1+nop)x copy of the weight maps (~1.2 ms/batch-16 at the op-3 fine
    # level, device profile r4) and its joint output lands in an exotic
    # {1,0,3,2} layout the consumer pays another 0.9 ms to unpack.
    # Per-field dots have identical contraction order (bit-identical
    # sums), skip both copies, and emit canonical (H, W) planes.
    p4 = res.p.reshape(nopw, noph, nop)                 # (ix, iy, ch)
    pch_ox = [jnp.broadcast_to(p4[None, :, :, ch], (psz, nopw, noph))
              .reshape(psz * nopw, noph) for ch in range(nop)]
    fields = [q_nat] + [q_nat * p[None] for p in pch_ox]

    hi = jax.lax.Precision.HIGHEST   # full f32: the replaced gather-add
    u4 = u.reshape(h, psz, noph)     # loop was exact f32

    def dens(q):
        # sum_{oy,iy} u4[h,oy,iy] * q[oy,(ox,ix),iy] -> (H, psz*nopw),
        # then sum_{ox,ix} against v[w,(ox,ix)] -> (H, W)
        b2 = jax.lax.dot_general(u4, q, (((1, 2), (0, 2)), ((), ())),
                                 precision=hi)
        return jax.lax.dot_general(b2, v, (((1,), (1,)), ((), ())),
                                   precision=hi)

    outs = [dens(q) for q in fields]
    we = outs[0].reshape(hw)
    flow = jnp.stack(outs[1:], axis=-1).reshape(hw, nop)

    if compl_res is not None:
        # backward merge (patchgrid.cpp:278-375); bilinear splat at the
        # backward patch's converged position, negated displacement.
        rppos = compl_res.pt                                  # (N,2)
        pos_c = jnp.ceil(rppos + 1e-5).astype(jnp.int32)      # (N,2) ceil
        resid = rppos - jnp.floor(rppos)
        rx, ry = resid[:, 0], resid[:, 1]
        lb = -psz // 2
        offs = jnp.arange(psz) + lb
        yt = pos_c[:, 1][:, None, None] + offs[None, :, None]
        xt = pos_c[:, 0][:, None, None] + offs[None, None, :]
        yt, xt = jnp.broadcast_arrays(yt, xt)                 # (N,P,P)
        bvalid = ((xt >= 1) & (yt >= 1) & (xt < spec.width - 1)
                  & (yt < spec.height - 1)).astype(jnp.float32)
        babsw = jnp.transpose(_pixel_weights(compl_res.pweight),
                              (2, 0, 1)) * bvalid            # (N,P,P)
        n_bw = babsw.shape[0]
        import os as _os
        if _os.environ.get("OF_DIS_TPU_SCATTER_FBCON"):
            # original scatter-add formulation (A/B escape hatch): XLA TPU
            # lowers the duplicate-index adds to a serialized update loop —
            # measured ~90x slower than plain op-2 end to end
            wbil = jnp.stack([rx * ry, (1 - rx) * ry, rx * (1 - ry),
                              (1 - rx) * (1 - ry)], axis=1)   # (N,4)
            flnew = (compl_res.p[:, None, None, :]
                     * babsw[..., None])                      # (N,P,P,nop)
            xt = jnp.clip(xt, 1, spec.width - 1)
            yt = jnp.clip(yt, 1, spec.height - 1)
            # 4 corners: cc (xt,yt), fc (xt-1,yt), cf (xt,yt-1), ff (-1,-1)
            corners = [(0, 0, 0), (1, -1, 0), (2, 0, -1), (3, -1, -1)]
            for k, dx_c, dy_c in corners:
                cidx = ((yt + dy_c) * spec.width + (xt + dx_c)).reshape(-1)
                wk = (wbil[:, k][:, None, None] * babsw).reshape(-1)
                we = we.at[cidx].add(wk)
                fk = wbil[:, k][:, None, None, None] * flnew
                flow = flow.at[cidx].add(-fk.reshape(-1, nop))
        else:
            # scatter-free MXU formulation (same sums, dot order): the 2x2
            # bilinear corner kernel is SEPARABLE,
            #   [[w00,w01],[w10,w11]] = (1-ry, ry)^T (x) (1-rx, rx),
            # so rather than correlating babsw into a (psz+1)^2 combined
            # footprint (an offset-slice build XLA lowers to
            # dynamic-update-slices on sub-tile (..,9,9) minors — measured
            # 29.5 of 42.9 ms of fbcon op-2 b64 device time), the two taps
            # per axis fold into the placement one-hots themselves: cell
            # ybase+i takes babsw[i,:] weighted (1-ry), cell ybase+i+1
            # takes it weighted ry (same per-column for rx). Placement is
            # two dynamic *soft* one-hot contractions — per-axis like the
            # forward path, with runtime converged positions. Out-of-range
            # cells match neither tap's comparison (and already carry zero
            # weight via bvalid).
            ybase = pos_c[:, 1] + lb - 1                      # (N,)
            xbase = pos_c[:, 0] + lb - 1
            ar = jnp.arange(psz, dtype=jnp.int32)
            yio = jnp.arange(spec.height, dtype=jnp.int32)
            xio = jnp.arange(spec.width, dtype=jnp.int32)
            ycmp = ybase[None, :, None] + ar[:, None, None]   # (P,N,1)
            ysoft = ((yio[None, None, :] == ycmp).astype(jnp.float32)
                     * (1 - ry)[None, :, None]
                     + (yio[None, None, :] == ycmp + 1).astype(jnp.float32)
                     * ry[None, :, None])                     # (P,N,H)
            xcmp = xbase[:, None, None] + ar[None, :, None]   # (N,P,1)
            xsoft = ((xio[None, None, :] == xcmp).astype(jnp.float32)
                     * (1 - rx)[:, None, None]
                     + (xio[None, None, :] == xcmp + 1).astype(jnp.float32)
                     * rx[:, None, None])                     # (N,P,W)
            # x placement: row footprints at their columns (N,P,W)
            vrow = jnp.einsum("nab,nbx->nax", babsw, xsoft,
                              precision=hi)                   # (N,P,W)
            # fold the per-patch field values [1, -p] into the y one-hots,
            # then one dot places every row of every field at once
            cmat = jnp.concatenate(
                [jnp.ones((1, n_bw), jnp.float32), -compl_res.p.T],
                axis=0)                                       # (1+nop,N)
            ysf = ysoft[:, :, None, :] * cmat.T[None, :, :, None]
            outb = jnp.einsum("aify,iax->fyx", ysf, vrow,
                              precision=hi)                   # (1+nop,H,W)
            we = we + outb[0].reshape(hw)
            flow = flow + jnp.moveaxis(outb[1:], 0, 2).reshape(hw, nop)

    flow = jnp.where(we[:, None] > 0, flow / we[:, None], flow)
    return flow.reshape(spec.height, spec.width, nop)
