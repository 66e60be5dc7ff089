"""Ahead-of-time warmup: pre-compile the (shape, params) pipeline
specializations a server will use, populating the persistent XLA compile
cache (.jax_cache/).

First-call compiles of the full batched pipeline on the tunneled TPU take
minutes (SMOKE_r02.txt measured 275 s for op-1's first call); a serving
process that hits an uncompiled (shape, batch, op-point) mid-stream stalls
its stream for that long. Run this once per deployment image instead:

    python tools/warmup.py --w 1024 --h 436 --batch 64 --ops 1,2 \
        --modes of_int,de_int

Every later process with the same .jax_cache directory loads the compiled
executable in seconds. Modes mirror the CLI binaries (of/de x int/rgb/grd:
grd compiles the same pipeline as int — same shapes/params — so it needs no
separate entry). Add --seq for the warm-start sequence-mode variant.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--w", type=int, default=1024)
    ap.add_argument("--h", type=int, default=436)
    ap.add_argument("--batch", type=int, default=64,
                    help="comma-separated batch sizes also accepted")
    ap.add_argument("--ops", default="2",
                    help="comma-separated op-points (1-4)")
    ap.add_argument("--modes", default="of_int",
                    help="comma-separated: of_int, of_rgb, de_int, de_rgb")
    ap.add_argument("--seq", action="store_true",
                    help="also warm the sequence-mode (warm-start) step")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), os.pardir,
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    from of_dis_tpu.models import dis
    from of_dis_tpu.ops import pyramid
    from of_dis_tpu.params import op_point_params

    mode_spec = {"of_int": (2, 1), "of_rgb": (2, 3),
                 "de_int": (1, 1), "de_rgb": (1, 3)}
    batches = [int(b) for b in str(args.batch).split(",")]
    ops = [int(o) for o in args.ops.split(",")]
    modes = args.modes.split(",")

    rng = np.random.default_rng(0)
    for mode in modes:
        nop, noc = mode_spec[mode]
        for op in ops:
            params = op_point_params(args.w, op, nop=nop, noc=noc,
                                     verbosity=0)
            for b in batches:
                base = rng.random((b, noc, args.h, args.w)).astype(
                    np.float32) * 255.0
                im = jax.vmap(lambda x: pyramid.pad_to_divisible(
                    x, params.sc_f))(jnp.asarray(base))
                fh, fw = int(im.shape[2]), int(im.shape[3])
                t0 = time.perf_counter()
                out = dis.dis_flow_batched(im, im, params, fw, fh,
                                           channels_last=False)
                float(np.asarray(out.ravel()[0]))   # force (axon: see bench)
                print(f"warm {mode} op={op} batch={b} {args.w}x{args.h}: "
                      f"{time.perf_counter() - t0:.1f}s", flush=True)
                if args.seq and nop == 2:
                    t0 = time.perf_counter()
                    # frames (T, S, C, H, W): two steps so the scan's
                    # carry path (warm start) compiles too
                    outs = dis.dis_sequence_batched(
                        jnp.stack([im, im, im], 0), params, fw, fh)
                    float(np.asarray(outs.ravel()[0]))
                    print(f"warm {mode} op={op} batch={b} seq: "
                          f"{time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
