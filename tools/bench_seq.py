"""Sequence-mode (video serving) throughput: S streams advance in lockstep
with warm-start chaining (dis_sequence_batched).

Warm starts speed convergence, which raises the GN extraction-cache hit
rate — at op-3 this measures ~9% faster per pair than cold pairs.

Usage: python tools/bench_seq.py [op_point] [streams] [frames]
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
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    t = int(sys.argv[3]) if len(sys.argv) > 3 else 9
    h_org, w_org = 436, 1024
    params = op_point_params(w_org, op, nop=2, noc=1, verbosity=0)
    rng = np.random.default_rng(0)
    # honest motion: frame k is the base warped by k x the spatially-varying
    # subpixel field (consecutive-frame flow ~ the field, like real video;
    # a uniform integer roll lets the extraction cache skip its dot —
    # flattering, see bench.py docstring)
    import bench as _bench
    base = rng.random((s, 1, h_org, w_org)).astype(np.float32) * 255.0
    for i in range(s):
        base[i, 0] = _bench._blur(base[i, 0])
    u, v = _bench._flow_field(h_org, w_org)
    # u8 frames (PNG-like, same as bench.py): also enables the tiled GN
    # kernel's in-kernel template extraction (u8-sourced pyramids)
    frames = np.stack([np.clip(np.rint(_bench._warp_pairs(
        base, k * u, k * v)), 0, 255).astype(np.uint8)
        for k in range(t)])                         # (T, S, C, H, W)
    pad = jax.vmap(jax.vmap(
        lambda x: pyramid.pad_to_divisible(x, params.sc_f)))
    fr = pad(jnp.asarray(frames))
    fh, fw = int(fr.shape[3]), int(fr.shape[4])

    def sync(x):
        return float(np.asarray(jnp.sum(x[:, :, :, ::64, ::64])))

    t0 = time.perf_counter()
    out = dis.dis_sequence_batched(fr, params, fw, fh)
    sync(out)
    print(f"compile+warm {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    out = dis.dis_sequence_batched(fr, params, fw, fh)
    sync(out)
    dt = time.perf_counter() - t0
    pairs = s * (t - 1)
    print(f"seq op{op} S={s} T={t}: {pairs / dt:.1f} pairs/s "
          f"({dt * 1e3 / pairs:.1f} ms/pair)")

    # apples-to-apples reference: the same pairs as one cold batch per step
    # (batch = S, no warm start, no scan) — isolates the scan/warm-start
    # overhead from the small-per-step-batch effect
    a = fr[:-1].reshape((t - 1) * s, *fr.shape[2:])
    b = fr[1:].reshape((t - 1) * s, *fr.shape[2:])

    def syncb(x):
        return float(np.asarray(jnp.sum(x[:, :, ::64, ::64])))

    t0 = time.perf_counter()
    for i in range(t - 1):
        o = dis.dis_flow_batched(a[i * s:(i + 1) * s], b[i * s:(i + 1) * s],
                                 params, fw, fh, channels_last=False)
    syncb(o)
    print(f"  compile+warm batched-b{s} {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    for i in range(t - 1):
        o = dis.dis_flow_batched(a[i * s:(i + 1) * s], b[i * s:(i + 1) * s],
                                 params, fw, fh, channels_last=False)
    syncb(o)
    dt = time.perf_counter() - t0
    print(f"cold-batch b={s} x{t - 1}: {pairs / dt:.1f} pairs/s "
          f"({dt * 1e3 / pairs:.1f} ms/pair)")


if __name__ == "__main__":
    main()
