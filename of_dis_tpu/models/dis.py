"""Coarse-to-fine DIS optical flow / depth model (the OFClass equivalent).

Orchestrates the per-scale stages (reference: oflow.cpp:31-338):
  pyramid -> [per scale, coarse to fine]:
    extract templates -> init from coarser flow -> batched patch optimization
    -> densification (with optional forward-backward merge) -> TV refinement.

The scale loop is Python (shapes differ per level); each full pipeline
specialization is jit-compiled once per (shape, params) and cached. The core
is natively batched over frame pairs (`dis_flow_batched`); shard the batch
axis over a device mesh via of_dis_tpu.parallel.

Differences from the reference by design (TPU-first):
  - patches are a lane-axis batch dimension in one fused solver, not
    objects/OpenMP threads (patchgrid.cpp:109-141),
  - densification is a deterministic per-pixel gather (the reference's
    optional OpenMP scatter path data-races, patchgrid.cpp:220-222),
  - TV's SOR solver sweeps red-black instead of raster, fused into a Pallas
    kernel on TPU (see ops/tv.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from of_dis_tpu.ops import densify, patch_solver, pyramid, tv
from of_dis_tpu.params import DISParams, make_level_spec


# Spatial (row-sharded) TV routing: when params carry a spatial_tv_mesh
# and a level's TV working set exceeds params.spatial_tv_min_bytes,
# _tv_refine dispatches to parallel.spatial.tv_refine_spatial (frames too
# large for one chip — SURVEY.md §5 long-context analogue). The route
# lives INSIDE the static DISParams (params.with_spatial_tv), so it is
# part of every jit cache key — no module-global trace-time state, no
# manual cache clearing.
_TV_FIELDS = 26   # ~fields of (H, W) f32 live per pair in the TV loop


def _spatial_tv_route(b: int, h: int, w: int, params: DISParams):
    """params.spatial_tv_mesh, if this level should be row-sharded over it."""
    mesh = params.spatial_tv_mesh
    if mesh is None:
        return None
    if b * _TV_FIELDS * h * w * 4 < params.spatial_tv_min_bytes:
        return None
    n = mesh.shape[params.spatial_tv_axis]
    # any shard height works: spatial.py threads each shard's global
    # row-origin parity into the red-black sweeps (solver.c:34-78 has no
    # size restriction either); only the even-division shard_map
    # requirement remains
    if h % n != 0:
        return None
    return mesh


def _tv_refine(flow: jnp.ndarray, im_a, im_b, spec, params: DISParams,
               camlr: int) -> jnp.ndarray:
    """Batched variational refinement of one scale's dense flow (VarRefClass,
    refine_variational.cpp:25-116). `flow` (B,H,W,nop); im_a/im_b (B,C,...)
    padded level images (de-padded here, copyimage
    refine_variational.cpp:119-149). TV is called on the whole batch (not
    under vmap) so the fused Pallas kernel can block several pairs per
    program."""
    pad = spec.pad
    im1 = im_a[:, :, pad:-pad, pad:-pad]
    im2 = im_b[:, :, pad:-pad, pad:-pad]
    n_inner = params.tv_innerit * (spec.level + 1)  # refine_variational.cpp:36
    kw = dict(alpha=params.tv_alpha, gamma=params.tv_gamma,
              delta=params.tv_delta, n_inner=n_inner,
              n_solver=params.tv_solverit, omega=params.tv_sor)
    mesh = _spatial_tv_route(flow.shape[0], im1.shape[2], im1.shape[3],
                             params)
    if mesh is not None:
        from of_dis_tpu.parallel import spatial

        if params.nop == 2:
            outs = [spatial.tv_refine_spatial(
                mesh, flow[k], im1[k], im2[k],
                axis_name=params.spatial_tv_axis, **kw)
                for k in range(flow.shape[0])]
        else:
            outs = [spatial.tv_refine_spatial_de(
                mesh, flow[k, :, :, 0], im1[k], im2[k], camlr=camlr,
                axis_name=params.spatial_tv_axis, **kw)[..., None]
                for k in range(flow.shape[0])]
        return jnp.stack(outs, axis=0)
    if params.nop == 2:
        wx, wy = tv.ref_level_of_batched(flow[..., 0], flow[..., 1],
                                         im1, im2, **kw)
        return jnp.stack([wx, wy], axis=-1)
    wx = tv.ref_level_de_batched(flow[..., 0], im1, im2, camlr=camlr, **kw)
    return wx[..., None]


def _dis_flow_core(im_a: jnp.ndarray, im_b: jnp.ndarray, params: DISParams,
                   full_w: int, full_h: int,
                   init_flow: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Batched coarse-to-fine DIS pipeline: im_a/im_b (B, C, H, W).

    Patch stages (templates/optimize/densify) are vmapped per pair; TV runs
    natively batched. Returns (B, H/2^sc_l, W/2^sc_l, nop).
    """
    pad = params.p_samp_s
    ims_a, dxs_a, dys_a = jax.vmap(
        lambda x: pyramid.build_pyramid(x, params.sc_f, pad,
                                        lv_l=params.sc_l))(im_a)
    ims_b, dxs_b, dys_b = jax.vmap(
        lambda x: pyramid.build_pyramid(x, params.sc_f, pad,
                                        lv_l=params.sc_l))(im_b)
    batch = im_a.shape[0]
    # u8-sourced pyramids reconstruct exactly from the bf16 hi/lo planes
    # (known at trace time from the input dtype) — this licenses the
    # tiled GN kernel's in-kernel template extraction (bit-identical to
    # extract_templates there, see optimize_level_batched)
    src_exact_fw = im_a.dtype == jnp.uint8
    src_exact_bw = im_b.dtype == jnp.uint8

    flow = None
    flow_bw = None
    for sl in range(params.sc_f, params.sc_l - 1, -1):
        spec = make_level_spec(sl, full_w, full_h, params, camlr=0)
        spec_bw = make_level_spec(sl, full_w, full_h, params, camlr=1)
        ia, dxa, dya = ims_a[sl], dxs_a[sl], dys_a[sl]
        ib, dxb, dyb = ims_b[sl], dxs_b[sl], dys_b[sl]

        if flow is None:
            if init_flow is not None:
                p_init = jax.vmap(lambda f: patch_solver.init_from_coarser(
                    spec, params, f))(init_flow)
            else:
                p_init = jnp.zeros((batch, spec.nopatches, params.nop),
                                   jnp.float32)
        else:
            p_init = jax.vmap(lambda f: patch_solver.init_from_coarser(
                spec, params, f))(flow)
        res_fw = patch_solver.optimize_level_batched(
            spec, params, ib, None, p_init, src=(ia, dxa, dya),
            src_exact=src_exact_fw, tgt_exact=src_exact_bw)

        res_bw = None
        if params.usefbcon:
            if flow_bw is None:
                p_init_bw = jnp.zeros((batch, spec_bw.nopatches, params.nop),
                                      jnp.float32)
            else:
                p_init_bw = jax.vmap(lambda f: patch_solver.init_from_coarser(
                    spec_bw, params, f))(flow_bw)
            res_bw = patch_solver.optimize_level_batched(
                spec_bw, params, ia, None, p_init_bw, src=(ib, dxb, dyb),
                src_exact=src_exact_bw, tgt_exact=src_exact_fw)

        def _densify(sp, res, compl):
            # vmap over explicit fields (the batched result's `iters` is a
            # shared scalar, not a per-pair leaf)
            one = patch_solver.PatchResult
            if compl is not None:
                return jax.vmap(lambda p, pt, pw, cp, cpt, cpw:
                                densify.aggregate_flow_dense(
                                    sp, params, one(p, pt, pw, res.iters),
                                    compl_res=one(cp, cpt, cpw, res.iters)))(
                    res.p, res.pt, res.pweight, compl.p, compl.pt,
                    compl.pweight)
            return jax.vmap(lambda p, pt, pw: densify.aggregate_flow_dense(
                sp, params, one(p, pt, pw, res.iters)))(
                res.p, res.pt, res.pweight)

        flow = _densify(spec, res_fw, res_bw)
        if params.usefbcon and sl > params.sc_l:
            # backward aggregation skipped at the last scale (oflow.cpp:266)
            flow_bw = _densify(spec_bw, res_bw, res_fw)

        if params.usetvref:
            flow = _tv_refine(flow, ia, ib, spec, params, camlr=0)
            if params.usefbcon and sl > params.sc_l:
                flow_bw = _tv_refine(flow_bw, ib, ia, spec_bw, params,
                                     camlr=1)
    return flow


@partial(jax.jit, static_argnames=("params", "full_w", "full_h"))
def dis_flow(im_a: jnp.ndarray, im_b: jnp.ndarray, params: DISParams,
             full_w: int, full_h: int,
             init_flow: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Run the full coarse-to-fine DIS pipeline on one frame pair.

    im_a, im_b: (C, H, W) float32, already divisibility-padded to 2^sc_f
    (use ops.pyramid.pad_to_divisible). full_w/full_h are their dimensions
    (static). init_flow, if given, warm-starts the coarsest scale and must
    have shape (H/2^(sc_f+1), W/2^(sc_f+1), nop) (reference: oflow.h:106,
    oflow.cpp:215-217) — this is also the hook for sequence pipelining
    (frame t's flow warm-starts t+1).

    Returns dense flow (H/2^sc_l, W/2^sc_l, nop) at the finest computed scale
    (the caller rescales to full resolution; run_dense.cpp:408-412).
    """
    init = None if init_flow is None else init_flow[None]
    return _dis_flow_core(im_a[None], im_b[None], params, full_w, full_h,
                          init)[0]


def _upscale_cf_pallas(flow_cf: jnp.ndarray, out_h: int, out_w: int,
                       scale: float):
    """Batched bilinear upscale of planar flow (B, nop, h, w) ->
    (B, nop, out_h, out_w) as one Pallas kernel, or None when no batch
    block fits VMEM.

    Both interpolation contractions (cv::INTER_LINEAR matrices; the value
    scale 2^sc_l is folded into the vertical one) run on f32 MXU dots per
    block and the full-resolution result is written directly in canonical
    layout — the XLA einsum form materializes a full-size batch-minor
    intermediate plus a relayout copy (~6.4ms per 384-pair Sintel batch,
    vs the ~1.8ms HBM write floor)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, nop, h, w = flow_cf.shape
    bb = None
    # budget: output block (dominant), input block, both matrices, and the
    # (h, out_w) per-dot intermediate; bb=2 at a full-res Sintel output
    # (~7.5MB by this estimate) compiles and runs
    fixed = (nop * h * w + out_h * h + w * out_w + h * out_w) * 4
    for cand in (8, 4, 2, 1):
        per = cand * nop * out_h * out_w * 4 + cand * fixed
        if b % cand == 0 and per < 8 * 1024 * 1024:
            bb = cand
            break
    if bb is None:
        return None
    mv = jnp.asarray(pyramid._lerp_matrix(out_h, h) * scale)   # (out_h, h)
    mw = jnp.asarray(pyramid._lerp_matrix(out_w, w).T)         # (w, out_w)

    def kernel(in_ref, mv_ref, mw_ref, out_ref):
        mv_ = mv_ref[:]
        mw_ = mw_ref[:]
        for k in range(bb):
            for ch in range(nop):
                t = jnp.dot(in_ref[k, ch], mw_,
                            preferred_element_type=jnp.float32)
                out_ref[k, ch] = jnp.dot(mv_, t,
                                         preferred_element_type=jnp.float32)

    return pl.pallas_call(
        kernel,
        grid=(b // bb,),
        out_shape=jax.ShapeDtypeStruct((b, nop, out_h, out_w), jnp.float32),
        in_specs=[
            pl.BlockSpec((bb, nop, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_h, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, out_w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, nop, out_h, out_w),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )(flow_cf, mv, mw)


def upscale_output(flow: jnp.ndarray, sc_l: int, out_h: int, out_w: int
                   ) -> jnp.ndarray:
    """Final rescale of the last-scale flow to full resolution
    (run_dense.cpp:408-412): multiply values by 2^sc_l, INTER_LINEAR resize."""
    if sc_l == 0:
        return flow
    sc = float(2 ** sc_l)
    f = (flow * sc).transpose(2, 0, 1)
    f = pyramid.resize_linear(f, out_h, out_w)
    return f.transpose(1, 2, 0)


def dis_flow_full(im_a: jnp.ndarray, im_b: jnp.ndarray, params: DISParams,
                  full_w: int, full_h: int,
                  init_flow: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """dis_flow + final upscale to the padded full resolution."""
    flow = dis_flow(im_a, im_b, params, full_w, full_h, init_flow)
    return upscale_output(flow, params.sc_l, full_h, full_w)


@partial(jax.jit, static_argnames=("params", "full_w", "full_h",
                                   "channels_last"))
def dis_flow_batched(im_a: jnp.ndarray, im_b: jnp.ndarray, params: DISParams,
                     full_w: int, full_h: int,
                     channels_last: bool = True) -> jnp.ndarray:
    """Throughput mode over a leading frame-pair batch axis.

    im_a, im_b: (B, C, H, W). Returns (B, H, W, nop) full-resolution flow,
    or (B, nop, H, W) with channels_last=False — the device-native planar
    layout, skipping a full-resolution relayout copy (~11us/pair); use it
    when the consumer (checksum, planar serving, host-side repack) does not
    need interleaved channels. Shard the batch axis over a mesh with
    of_dis_tpu.parallel for multi-chip.
    """
    flow = _dis_flow_core(im_a, im_b, params, full_w, full_h)
    sc = float(2 ** params.sc_l)
    if params.sc_l == 0:
        f = jnp.moveaxis(flow, 3, 1)                    # (B, nop, h, w)
    else:
        f = None
        if patch_solver._use_pallas_bilerp():
            f = _upscale_cf_pallas(jnp.moveaxis(flow, 3, 1), full_h, full_w,
                                   sc)
        if f is None:
            f = jnp.moveaxis(flow * sc, 3, 1)
            f = jax.vmap(lambda x: pyramid.resize_linear(x, full_h,
                                                         full_w))(f)
    if channels_last:
        return jnp.moveaxis(f, 1, 3)
    return f


def warm_start_from_full(flow_full: jnp.ndarray, sc_f: int) -> jnp.ndarray:
    """Downscale a full-resolution flow to the warm-start input shape
    (H/2^(sc_f+1), W/2^(sc_f+1), nop): value scale 2^-(sc_f+1) + box-mean
    (cv::INTER_AREA) resize, per the reference's init-flow ingestion
    (run_dense.cpp:373-376)."""
    k = 2 ** (sc_f + 1)
    h, w, c = flow_full.shape
    f = flow_full[: (h // k) * k, : (w // k) * k] * (1.0 / k)
    return f.reshape(h // k, k, w // k, k, c).mean(axis=(1, 3))


@partial(jax.jit, static_argnames=("params", "full_w", "full_h"))
def dis_sequence(frames: jnp.ndarray, params: DISParams, full_w: int,
                 full_h: int) -> jnp.ndarray:
    """Sequence mode: flow for consecutive pairs of a video, each pair
    warm-started from the previous pair's flow (the hook the reference keeps
    as its commented-out initialization-flow input, run_dense.cpp:356-379,
    oflow.cpp:215-217).

    frames: (T, C, H, W) divisibility-padded. Returns (T-1, H, W, nop).
    """
    k = 2 ** (params.sc_f + 1)
    init = jnp.zeros((full_h // k, full_w // k, params.nop), jnp.float32)

    def step(carry, pair):
        a, b = pair
        flow = dis_flow_full(a, b, params, full_w, full_h, init_flow=carry)
        return warm_start_from_full(flow, params.sc_f), flow

    _, flows = jax.lax.scan(step, init, (frames[:-1], frames[1:]))
    return flows


def _warm_step(im_a: jnp.ndarray, im_b: jnp.ndarray, params: DISParams,
               full_w: int, full_h: int, carry: jnp.ndarray):
    """One warm-started step over S stream lanes: (S, C, H, W) pair batch +
    per-stream warm-start carry -> ((S, H, W, nop) full-res flow, next
    carry). Shared by dis_sequence_batched's scan and the streaming
    serving pipeline (pipeline.py --streams)."""
    flow = _dis_flow_core(im_a, im_b, params, full_w, full_h,
                          init_flow=carry)
    full = None
    if params.sc_l != 0 and patch_solver._use_pallas_bilerp():
        f = _upscale_cf_pallas(jnp.moveaxis(flow, 3, 1), full_h, full_w,
                               float(2 ** params.sc_l))
        if f is not None:
            full = jnp.moveaxis(f, 1, 3)
    if full is None:
        full = jax.vmap(lambda f: upscale_output(f, params.sc_l, full_h,
                                                 full_w))(flow)
    nxt = jax.vmap(lambda f: warm_start_from_full(f, params.sc_f))(full)
    return full, nxt


def warm_carry_init(s: int, params: DISParams, full_w: int,
                    full_h: int) -> jnp.ndarray:
    """Zero warm-start carry for S stream lanes (the cold start of a
    warm-start chain; reference hook: oflow.cpp:215-217 with a null
    initflow)."""
    k = 2 ** (params.sc_f + 1)
    return jnp.zeros((s, full_h // k, full_w // k, params.nop), jnp.float32)


@partial(jax.jit, static_argnames=("params", "full_w", "full_h"))
def dis_step_warm(im_a: jnp.ndarray, im_b: jnp.ndarray, params: DISParams,
                  full_w: int, full_h: int, carry: jnp.ndarray):
    """Jitted single step of the S-stream warm-start serving loop: feed
    consecutive pairs of S video streams step by step, threading the carry
    (start from warm_carry_init). Equivalent to one scan step of
    dis_sequence_batched — the streaming form for serving loops that
    cannot hold whole videos in memory (pipeline.py --streams)."""
    return _warm_step(im_a, im_b, params, full_w, full_h, carry)


@partial(jax.jit, static_argnames=("params", "full_w", "full_h"))
def dis_sequence_batched(frames: jnp.ndarray, params: DISParams, full_w: int,
                         full_h: int) -> jnp.ndarray:
    """Batched sequence mode: S video streams advance in lockstep, each
    pair warm-started from its stream's previous flow (the throughput
    configuration for video serving: per-step batch keeps the chip full
    while the scan carries the warm starts).

    frames: (T, S, C, H, W) divisibility-padded. Returns
    (T-1, S, H, W, nop) full-resolution flow.
    """
    s = frames.shape[1]
    init = warm_carry_init(s, params, full_w, full_h)

    def step(carry, pair):
        a, b = pair
        full, nxt = _warm_step(a, b, params, full_w, full_h, carry)
        return nxt, full

    _, flows = jax.lax.scan(step, init, (frames[:-1], frames[1:]))
    return flows


def dis_flow_timed(im_a: jnp.ndarray, im_b: jnp.ndarray, params: DISParams,
                   full_w: int, full_h: int,
                   init_flow: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Verbosity-2 debug path: same pipeline as dis_flow but with each stage
    executed to completion and timed, printing the reference's per-scale
    six-column breakdown (oflow.cpp:297):

      TIME (Sc: i, #p: n, pconst, pinit, poptim, cflow, tvopt, total): ...

    Timings are host-side perf_counter spans around synchronized stages
    (SURVEY.md §5 tracing contract). Synchronization fetches one scalar that
    depends on the stage output: on the tunneled-TPU (axon) platform
    block_until_ready does not actually block."""
    import time as _time

    def _sync(tree):
        leaf = jax.tree_util.tree_leaves(tree)[0]
        np_val = jnp.ravel(leaf)[0]
        import numpy as _np
        _np.asarray(np_val)

    def clock():
        return _time.perf_counter()

    pad = params.p_samp_s
    t0 = clock()
    ims_a, dxs_a, dys_a = pyramid.build_pyramid(im_a, params.sc_f, pad,
                                                lv_l=params.sc_l)
    ims_b, dxs_b, dys_b = pyramid.build_pyramid(im_b, params.sc_f, pad,
                                                lv_l=params.sc_l)
    _sync(ims_a)
    # reference: run_dense.cpp:347-353 (printed between pyramid build and
    # the OFClass run)
    print("TIME (Pyramide+Gradients) (ms): %3g" % ((clock() - t0) * 1e3))

    # per-scale grid/spec setup, the analogue of OFClass's up-front
    # PatGridClass allocation (oflow.cpp:139-178)
    t0 = clock()
    specs = {}
    for sl in range(params.sc_f, params.sc_l - 1, -1):
        specs[sl] = (make_level_spec(sl, full_w, full_h, params, camlr=0),
                     make_level_spec(sl, full_w, full_h, params, camlr=1))
    print("TIME (Grid Memo. Alloc. ) (ms): %3g" % ((clock() - t0) * 1e3))

    flow = None
    flow_bw = None
    for sl in range(params.sc_f, params.sc_l - 1, -1):
        spec, spec_bw = specs[sl]
        ia, dxa, dya = ims_a[sl], dxs_a[sl], dys_a[sl]
        ib, dxb, dyb = ims_b[sl], dxs_b[sl], dys_b[sl]

        t0 = clock()
        tpl_fw = patch_solver.extract_templates(spec, params, ia, dxa, dya)
        tpl_bw = None
        if params.usefbcon:
            tpl_bw = patch_solver.extract_templates(spec_bw, params, ib, dxb,
                                                    dyb)
        _sync(tpl_fw)
        t_pconst = clock() - t0

        t0 = clock()
        if flow is None:
            if init_flow is not None:
                p_init = patch_solver.init_from_coarser(spec, params, init_flow)
            else:
                p_init = jnp.zeros((spec.nopatches, params.nop), jnp.float32)
        else:
            p_init = patch_solver.init_from_coarser(spec, params, flow)
        p_init_bw = None
        if params.usefbcon:
            if flow_bw is None:
                p_init_bw = jnp.zeros((spec_bw.nopatches, params.nop),
                                      jnp.float32)
            else:
                p_init_bw = patch_solver.init_from_coarser(spec_bw, params,
                                                           flow_bw)
        _sync(p_init)
        t_pinit = clock() - t0

        t0 = clock()
        res_fw = patch_solver.optimize_level(spec, params, ib, tpl_fw, p_init)
        res_bw = None
        if params.usefbcon:
            res_bw = patch_solver.optimize_level(spec_bw, params, ia, tpl_bw,
                                                 p_init_bw)
        _sync(res_fw)
        t_poptim = clock() - t0

        t0 = clock()
        flow = densify.aggregate_flow_dense(spec, params, res_fw,
                                            compl_res=res_bw)
        if params.usefbcon and sl > params.sc_l:
            flow_bw = densify.aggregate_flow_dense(spec_bw, params, res_bw,
                                                   compl_res=res_fw)
        _sync(flow)
        t_cflow = clock() - t0

        t0 = clock()
        if params.usetvref:
            flow = _tv_refine(flow[None], ia[None], ib[None], spec, params,
                              camlr=0)[0]
            if params.usefbcon and sl > params.sc_l:
                flow_bw = _tv_refine(flow_bw[None], ib[None], ia[None],
                                     spec_bw, params, camlr=1)[0]
            _sync(flow)
        t_tvopt = clock() - t0

        tot = t_pconst + t_pinit + t_poptim + t_cflow + t_tvopt
        print("TIME (Sc: %i, #p:%6i, pconst, pinit, poptim, cflow, tvopt, "
              "total): %8.2f %8.2f %8.2f %8.2f %8.2f -> %8.2f ms."
              % (sl, spec.nopatches, t_pconst * 1e3, t_pinit * 1e3,
                 t_poptim * 1e3, t_cflow * 1e3, t_tvopt * 1e3, tot * 1e3))
    return flow
