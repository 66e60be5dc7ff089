"""Microbenchmark: can Mosaic run int8 x int8 -> int32 MXU dots, and how
fast vs the bf16 dots the GN extraction kernels use today?

Shapes mirror the tiled GN kernel's stage-1 x-dot: (w1c*yb, xb) @ (xb, nb)
= (832, 256) @ (256, 256). Each grid program runs REPS unrolled dots of
*distinct static row-slices* of a taller A (so nothing is hoistable or
fusable), all into one accumulator; G programs repeat the work so the
total is well above dispatch noise. v5e peak: 394 TOPS i8 vs 197 TFLOPS
bf16 -> a 2x ceiling for the i8 form.

Usage: python tools/bench_i8_dot.py [reps] [grid] [m] [k] [n]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    grid = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 832
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 256
    n = int(sys.argv[5]) if len(sys.argv) > 5 else 256
    nb_ = n * reps   # B holds `reps` distinct tile-aligned rhs blocks

    def make(acc):
        def kernel(a_ref, b_ref, o_ref):
            a = a_ref[...]
            o = jnp.zeros((m, n), acc)
            for i in range(reps):
                # lane slices at n-multiples are tile-aligned views — no
                # relayout; each dot reads a distinct rhs so nothing is
                # hoistable or fusable
                o = o + jnp.dot(a, b_ref[:, n * i:n * i + n],
                                preferred_element_type=acc)
            o_ref[...] = o

        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec((m, k), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((k, nb_), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((m, n), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), acc),
        )

    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 127, (m, k), np.int8))
    b8 = jnp.asarray((rng.random((k, nb_)) < 0.01).astype(np.int8))
    ab = a8.astype(jnp.bfloat16)
    bb = b8.astype(jnp.bfloat16)

    def bench(name, fn, a, b):
        try:
            out = fn(a, b)
            float(np.asarray(out)[0, 0])
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
            return None
        t0 = time.perf_counter()
        out = fn(a, b)
        s = float(np.asarray(out)[0, 0])
        dt = time.perf_counter() - t0
        flops = 2.0 * m * k * n * reps * grid
        print(f"{name}: {dt*1e3:.2f} ms  {flops/dt/1e12:.1f} T(FL)OPS/s"
              f"  (checksum {s})")
        return dt

    t_bf = bench("bf16 -> f32", jax.jit(make(jnp.float32)), ab, bb)
    t_i8 = bench("int8 -> int32", jax.jit(make(jnp.int32)), a8, b8)
    if t_bf and t_i8:
        print(f"i8 speedup over bf16: {t_bf / t_i8:.2f}x")


if __name__ == "__main__":
    main()
