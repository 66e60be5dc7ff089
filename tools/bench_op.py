"""Quick throughput check for any op-point on the real TPU.

Usage: python tools/bench_op.py [op_point] [batch] [iters] [noc] [nop]
Prints pairs/s (checksum-synchronized, one host fetch at the end).
Motion field: bench.py's spatially-varying subpixel flow.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    from of_dis_tpu.models import dis
    from of_dis_tpu.ops import pyramid
    from of_dis_tpu.params import op_point_params

    op = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    noc = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    nop = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    h_org, w_org = 436, 1024
    params = op_point_params(w_org, op, nop=nop, noc=noc, verbosity=0)
    rng = np.random.default_rng(0)
    import bench as _bench
    if os.environ.get("BENCH_MOTION") == "boundary" and nop == 2:
        # motion-discontinuity field: a moving "object" block whose flow
        # jumps ~25 px against the background — tiles straddling the
        # boundary exceed the tiled-GN windows, exercising the bounded
        # per-tile recompute (and the r=16 warp band) instead of the
        # smooth-field fast path
        base, _ = _bench._make_pairs(rng, b, h_org, w_org, noc=noc)
        u, v = _bench._flow_field(h_org, w_org)
        yy, xx = np.mgrid[0:h_org, 0:w_org]
        obj = ((yy > h_org // 4) & (yy < h_org // 2)
               & (xx > w_org // 3) & (xx < 2 * w_org // 3))
        u = (u + obj * 25.0).astype(np.float32)
        v = (v + obj * 12.0).astype(np.float32)
        shift = np.clip(np.rint(_bench._warp_pairs(base, u, v)),
                        0, 255).astype(np.uint8)
    elif nop == 2:
        base, shift = _bench._make_pairs(rng, b, h_org, w_org, noc=noc)
    else:
        base, _ = _bench._make_pairs(rng, b, h_org, w_org, noc=noc)
        u, v = _bench._flow_field(h_org, w_org)
        shift = np.clip(np.rint(_bench._warp_pairs(
            base, -np.abs(u), np.zeros_like(v))), 0, 255).astype(np.uint8)
    pad = jax.vmap(lambda x: pyramid.pad_to_divisible(x, params.sc_f))
    im_a = pad(jnp.asarray(base))
    im_b = pad(jnp.asarray(shift))
    fw, fh = int(im_a.shape[3]), int(im_a.shape[2])

    @jax.jit
    def step(a, bb, acc):
        out = dis.dis_flow_batched(a, bb, params, fw, fh,
                                   channels_last=False)
        return acc + jnp.sum(out[:, :, ::64, ::64])

    t0 = time.perf_counter()
    acc = step(im_a, im_b, jnp.float32(0))
    float(np.asarray(acc))
    t_compile = time.perf_counter() - t0

    t0 = time.perf_counter()
    acc = jnp.float32(0)
    for _ in range(iters):
        acc = step(im_a, im_b, acc)
    float(np.asarray(acc))
    dt = time.perf_counter() - t0
    pairs = b * iters / dt
    print(f"op{op} noc={noc} nop={nop} b={b} iters={iters}: {pairs:.1f} pairs/s "
          f"({dt / iters * 1e3:.1f} ms/batch, compile+warm {t_compile:.1f}s)")


if __name__ == "__main__":
    main()
