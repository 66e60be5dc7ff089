"""Densification: patch displacements -> dense flow, as deterministic
scatter-adds (reference: PatGridClass::AggregateFlowDense, patchgrid.cpp:213-397).

The reference's optional OpenMP version data-races by design
(patchgrid.cpp:220-222, CMakeLists.txt:29-30); here the scatter-add is an XLA
scatter which is deterministic on TPU.

Two paths:
  - forward: each valid patch splats its displacement over its p x p integer
    footprint, weighted per-pixel by 1/max(minerrval, residual)
    (RGB: 1/sum_c max(minerrval, residual_c)) (patchgrid.cpp:223-275). The
    footprint indices depend only on the static grid geometry -> compile-time
    constants.
  - backward merge ("fbcon"): the complementary grid's patches splat their
    NEGATED displacement bilinearly at their *converged* target position
    (patchgrid.cpp:278-375). Indices are runtime values.

Finally each pixel is normalized by its accumulated weight (patchgrid.cpp:377-394).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from of_dis_tpu.ops.patch_solver import PatchResult
from of_dis_tpu.params import DISParams, LevelSpec, MINERRVAL, grid_points


def _pixel_weights(pweight: jnp.ndarray) -> jnp.ndarray:
    """(N,P,P,C) residual weights -> (N,P,P) per-pixel splat weight
    1/max(2,res) (gray) or 1/sum_c max(2,res_c) (RGB); patchgrid.cpp:253-260."""
    clamped = jnp.maximum(pweight, MINERRVAL)
    return 1.0 / jnp.sum(clamped, axis=3)


def _forward_indices(spec: LevelSpec, psz: int):
    """Static (N,P,P) flat footprint indices + validity mask
    (patchgrid.cpp:241-251)."""
    xs, ys = grid_points(spec)
    lb = -psz // 2
    offs = np.arange(psz) + lb
    yt = np.asarray(ys)[:, None, None] + offs[None, :, None]  # (N,P,1)
    xt = np.asarray(xs)[:, None, None] + offs[None, None, :]  # (N,1,P)
    yt, xt = np.broadcast_arrays(yt, xt)
    valid = (xt >= 0) & (yt >= 0) & (xt < spec.width) & (yt < spec.height)
    flat = np.where(valid, yt * spec.width + xt, 0).astype(np.int32)
    return jnp.asarray(flat), jnp.asarray(valid.astype(np.float32))


def aggregate_flow_dense(spec: LevelSpec, params: DISParams, res: PatchResult,
                         compl_res: Optional[PatchResult] = None) -> jnp.ndarray:
    """Dense flow (H, W, nop) from per-patch results (patchgrid.cpp:213-397)."""
    psz, nop = params.p_samp_s, params.nop
    hw = spec.height * spec.width

    flat, valid = _forward_indices(spec, psz)
    absw = _pixel_weights(res.pweight) * valid          # (N,P,P)
    idx = flat.reshape(-1)
    w_flat = absw.reshape(-1)

    we = jnp.zeros((hw,), jnp.float32).at[idx].add(w_flat)
    contrib = res.p[:, None, None, :] * absw[..., None]  # (N,P,P,nop)
    flow = jnp.zeros((hw, nop), jnp.float32).at[idx].add(
        contrib.reshape(-1, nop))

    if compl_res is not None:
        # backward merge (patchgrid.cpp:278-375); bilinear splat at the
        # backward patch's converged position, negated displacement.
        rppos = compl_res.pt                                  # (N,2)
        pos_c = jnp.ceil(rppos + 1e-5).astype(jnp.int32)      # (N,2) ceil
        resid = rppos - jnp.floor(rppos)
        rx, ry = resid[:, 0], resid[:, 1]
        wbil = jnp.stack([rx * ry, (1 - rx) * ry, rx * (1 - ry),
                          (1 - rx) * (1 - ry)], axis=1)       # (N,4)
        lb = -psz // 2
        offs = jnp.arange(psz) + lb
        yt = pos_c[:, 1][:, None, None] + offs[None, :, None]
        xt = pos_c[:, 0][:, None, None] + offs[None, None, :]
        yt, xt = jnp.broadcast_arrays(yt, xt)                 # (N,P,P)
        bvalid = ((xt >= 1) & (yt >= 1) & (xt < spec.width - 1)
                  & (yt < spec.height - 1)).astype(jnp.float32)
        babsw = _pixel_weights(compl_res.pweight) * bvalid    # (N,P,P)
        flnew = compl_res.p[:, None, None, :] * babsw[..., None]  # (N,P,P,nop)
        xt = jnp.clip(xt, 1, spec.width - 1)
        yt = jnp.clip(yt, 1, spec.height - 1)
        # 4 corners: cc (xt,yt), fc (xt-1,yt), cf (xt,yt-1), ff (xt-1,yt-1)
        corners = [(0, 0, 0), (1, -1, 0), (2, 0, -1), (3, -1, -1)]
        for k, dx_c, dy_c in corners:
            cidx = ((yt + dy_c) * spec.width + (xt + dx_c)).reshape(-1)
            wk = (wbil[:, k][:, None, None] * babsw).reshape(-1)
            we = we.at[cidx].add(wk)
            fk = wbil[:, k][:, None, None, None] * flnew
            flow = flow.at[cidx].add(-fk.reshape(-1, nop))

    flow = jnp.where(we[:, None] > 0, flow / we[:, None], flow)
    return flow.reshape(spec.height, spec.width, nop)
