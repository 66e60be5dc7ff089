"""Command-line driver reproducing the reference's four binaries and CLI.

Usage (reference: README.md:46-86, run_dense.cpp:186-295):

  python -m of_dis_tpu.cli run_OF_INT img1 img2 out.flo            # op-point 2
  python -m of_dis_tpu.cli run_OF_INT img1 img2 out.flo 3          # op-point 3
  python -m of_dis_tpu.cli run_OF_INT img1 img2 out.flo \
      lv_f lv_l maxiter miniter mindprate mindrrate minimgerr patchsz poverl \
      usefbcon patnorm costfct tvref tv_alpha tv_gamma tv_delta tv_innerit \
      tv_solverit tv_sor verbosity                                 # 20 params

Modes: run_OF_INT (flow, gray), run_OF_RGB (flow, color), run_DE_INT /
run_DE_RGB (depth from stereo, .pfm output); run_OF_GRD / run_DE_GRD use
gradient-magnitude input (the reference's SELECTCHANNEL==2 path exists at
run_dense.cpp:139-148 but no CMake target builds it). The reference's
compile-time SELECTMODE/SELECTCHANNEL become this runtime mode argument. Extra optional
flags (extensions): `--init-flow FILE` exposes the reference's commented-out
warm-start input (run_dense.cpp:356-379) as a real feature; `--quiet`
silences the op-point form's default verbosity 2.

Verbosity: 0 silent, 1 total flow time, 2 adds per-stage timings
(reference: oflow.cpp:333-337, run_dense.cpp:314-321, 347-353, 424-429);
timings are host-side perf_counter spans around block_until_ready'd stages.
"""

from __future__ import annotations

import dataclasses
import sys
import time

import numpy as np

import jax.numpy as jnp

from of_dis_tpu.models import dis
from of_dis_tpu.ops import pyramid
from of_dis_tpu.params import DISParams, op_point_params, pad_amounts
from of_dis_tpu.utils import io


def parse_args(argv):
    mode = argv[0]
    assert mode in ("run_OF_INT", "run_OF_RGB", "run_DE_INT", "run_DE_RGB",
                    "run_OF_GRD", "run_DE_GRD"), f"unknown mode {mode}"
    nop = 2 if "OF" in mode else 1
    noc = 3 if "RGB" in mode else 1
    img1, img2, outfile = argv[1], argv[2], argv[3]
    rest = list(argv[4:])
    init_flow_path = None
    if "--init-flow" in rest:
        k = rest.index("--init-flow")
        init_flow_path = rest[k + 1]
        del rest[k:k + 2]
    quiet = "--quiet" in rest
    if quiet:
        rest.remove("--quiet")
    return mode, nop, noc, img1, img2, outfile, rest, init_flow_path, quiet


def build_params(width_org, nop, noc, rest) -> DISParams:
    if len(rest) <= 1:  # op-point form (run_dense.cpp:226-268)
        sel = int(rest[0]) if rest else 2
        return op_point_params(width_org, sel, nop=nop, noc=noc, verbosity=2)
    # explicit 20-parameter form (run_dense.cpp:270-295)
    (lv_f, lv_l, maxit, minit, mindp, mindr, minerr, psz, pov, fb, pn, cf,
     tvref, a, g, d, innerit, solverit, sor, verb) = rest[:20]
    return DISParams(
        sc_f=int(lv_f), sc_l=int(lv_l), max_iter=int(maxit),
        min_iter=int(minit), dp_thresh=float(mindp), dr_thresh=float(mindr),
        res_thresh=float(minerr), p_samp_s=int(psz), patove=float(pov),
        usefbcon=bool(int(fb)), patnorm=int(pn), costfct=int(cf),
        usetvref=bool(int(tvref)), tv_alpha=float(a), tv_gamma=float(g),
        tv_delta=float(d), tv_innerit=int(innerit),
        tv_solverit=int(solverit), tv_sor=float(sor), verbosity=int(verb),
        nop=nop, noc=noc)


def load_init_flow(path, nop, pad_lv, full_h, full_w, sc_f):
    """Warm-start flow ingestion (run_dense.cpp:356-379): read a full-res
    .flo, replicate-pad to the padded full size, scale values by
    2^(-lv_f-1), then cv::INTER_AREA resize — an exact box mean at this
    integer factor (the padded dims divide 2^(lv_f+1) because main() pads
    images to pad_lv = sc_f+1 when an init file is given,
    run_dense.cpp:302)."""
    f = io.read_flo(path)[:, :, :nop]
    ft, fb, fl, fr = pad_amounts(f.shape[1], f.shape[0], pad_lv)
    f = np.pad(f, ((ft, fb), (fl, fr), (0, 0)), mode="edge")
    if f.shape[:2] != (full_h, full_w):
        # resolution-mismatched init flow (the reference assumes matching
        # resolution, run_dense.cpp:362; accept it anyway): bilinear-resize
        # to the padded frame size, rescaling the displacement values from
        # the init flow's pixel units to frame pixels (x by the width
        # factor, y by the height factor; nop=1 disparity is x-only)
        sx = full_w / f.shape[1]
        sy = full_h / f.shape[0]
        f = np.asarray(pyramid.resize_linear(
            jnp.asarray(f.transpose(2, 0, 1)), full_h,
            full_w)).transpose(1, 2, 0)
        scale = np.asarray([sx, sy][:nop], np.float32)
        f = f * scale
    k = 2 ** (sc_f + 1)
    f = jnp.asarray((f * (1.0 / k)).transpose(2, 0, 1))
    f = pyramid._resize_mm(f, full_h // k, full_w // k, box=k)
    return f.transpose(1, 2, 0)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    t0 = time.perf_counter()
    mode, nop, noc, img1p, img2p, outfile, rest, init_path, quiet = \
        parse_args(argv)

    img1 = io.load_image(img1p, channels=noc)
    img2 = io.load_image(img2p, channels=noc)
    if "GRD" in mode:
        # gradient-magnitude input (the reference's SELECTCHANNEL==2 path,
        # run_dense.cpp:139-148 — present in its source but never built);
        # non-integral values: stays f32
        img1 = np.asarray(pyramid.gradient_magnitude(jnp.asarray(img1)))
        img2 = np.asarray(pyramid.gradient_magnitude(jnp.asarray(img2)))
    else:
        # loaders emit integer-valued f32 of 8-bit sources: ship u8 (the
        # pyramid's exact single-dot bf16 ingestion path; bit-identical)
        img1 = img1.astype(np.uint8)
        img2 = img2.astype(np.uint8)
    h_org, w_org = img1.shape[1], img1.shape[2]

    params = build_params(w_org, nop, noc, rest)
    if quiet:  # extension: silence the reference's default verbosity-2
        params = dataclasses.replace(params, verbosity=0)
    verb = params.verbosity

    # divisibility padding (run_dense.cpp:299-311); with an init-flow file the
    # reference pads to 2^(lv_f+1) instead (run_dense.cpp:302) so the
    # coarsest+1-scale warm-start grid divides evenly
    pad_lv = params.sc_f + 1 if init_path is not None else params.sc_f
    a = pyramid.pad_to_divisible(jnp.asarray(img1), pad_lv)
    b = pyramid.pad_to_divisible(jnp.asarray(img2), pad_lv)
    full_h, full_w = a.shape[1], a.shape[2]
    top, _, left, _ = pad_amounts(w_org, h_org, pad_lv)

    if verb > 1:
        print(f"TIME (Image loading     ) (ms): {(time.perf_counter()-t0)*1e3:3g}")
        t0 = time.perf_counter()

    init_flow = None
    if init_path is not None:
        init_flow = load_init_flow(init_path, nop, pad_lv, full_h, full_w,
                                   params.sc_f)

    t_run = time.perf_counter()
    if verb > 1:
        # staged debug path printing per-scale 6-column breakdown
        flow = dis.dis_flow_timed(a, b, params, full_w, full_h, init_flow)
        flow = dis.upscale_output(flow, params.sc_l, full_h, full_w)
    else:
        flow = dis.dis_flow_full(a, b, params, full_w, full_h, init_flow)
    flow = np.asarray(jnp.asarray(flow).block_until_ready())
    if verb > 0:
        print(f"TIME (O.Flow Run-Time   ) (ms): {(time.perf_counter()-t_run)*1e3:3g}")
    t0 = time.perf_counter()

    # crop divisibility padding (run_dense.cpp:415)
    flow = flow[top:top + h_org, left:left + w_org]

    if nop == 2:
        io.write_flo(outfile, flow)
    else:
        io.write_pfm(outfile, flow[:, :, 0])
    if verb > 1:
        print(f"TIME (Saving flow file  ) (ms): {(time.perf_counter()-t0)*1e3:3g}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
