"""Probe the op-2 wall-vs-device dispatch gap (PERF.md round 5).

Round 4 left ~12% of op-2 on the table: 71.2 us/pair device time vs
~81-84 us wall at batch 384. Batch 384 wall/step is ~31 ms -- suspiciously
equal to the axon tunnel's ~31 ms RTT floor -- suggesting the client
serializes executable launches (wall/step = max(device, RTT)) rather than
an XLA schedule gap. This probe distinguishes the hypotheses:

  1. tiny-jit launch cadence: 50 data-chained trivial launches. If each
     launch pays an RTT, wall ~ 50 x 31 ms; if launches enqueue ahead,
     wall ~ 1 RTT.
  2. op-2 wall/step vs batch (256/384/512/768): under the max(device, RTT)
     model, pairs/s should jump to device-bound (~14k) once
     batch x 71.2 us > RTT.
  3. scan-of-K trips per launch at batch 384: K pipeline runs inside ONE
     executable. If the gap is launch cadence, K=2 recovers device-bound
     throughput without a bigger batch.

Usage: python tools/probe_dispatch.py [probe ...]  (default: all)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    return float(np.asarray(x))


def probe_tiny(jnp, jax):
    x = jax.device_put(jnp.ones((8, 128), jnp.float32))

    @jax.jit
    def add(a):
        return a + 1.0

    x = add(x)
    _sync(x[0, 0])
    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        x = add(x)
    _sync(x[0, 0])
    dt = time.perf_counter() - t0
    print(f"tiny-jit: {n} chained launches in {dt*1e3:.1f} ms "
          f"({dt/n*1e3:.2f} ms/launch)", flush=True)


def _op2_inputs(jax, jnp, batch):
    import bench as _bench
    from of_dis_tpu.ops import pyramid
    from of_dis_tpu.params import op_point_params

    h_org, w_org = 436, 1024
    params = op_point_params(w_org, 2, nop=2, noc=1, verbosity=0)
    rng = np.random.default_rng(0)
    base, shift = _bench._make_pairs(rng, batch, h_org, w_org)
    pad = jax.vmap(lambda x: pyramid.pad_to_divisible(x, params.sc_f))
    im_a = jax.device_put(pad(jnp.asarray(base)))
    im_b = jax.device_put(pad(jnp.asarray(shift)))
    return params, im_a, im_b


def probe_batches(jax, jnp, batches=(256, 384, 512, 768)):
    from of_dis_tpu.models import dis

    for batch in batches:
        params, im_a, im_b = _op2_inputs(jax, jnp, batch)
        fw, fh = int(im_a.shape[3]), int(im_a.shape[2])

        @jax.jit
        def step(a, b, chk):
            out = dis.dis_flow_batched(a, b, params, fw, fh,
                                       channels_last=False)
            return chk + jnp.sum(out)

        t0 = time.perf_counter()
        _sync(step(im_a, im_b, jnp.float32(0)))
        tc = time.perf_counter() - t0
        iters = 10
        t0 = time.perf_counter()
        chk = jnp.float32(0)
        for i in range(iters):
            chk = step(im_a, im_b, chk) if i % 2 == 0 else step(
                im_b, im_a, chk)
        _sync(chk)
        dt = time.perf_counter() - t0
        print(f"op2 b={batch}: {batch*iters/dt:.0f} pairs/s "
              f"({dt/iters*1e3:.2f} ms/step, {dt/iters/batch*1e6:.1f} "
              f"us/pair; compile+warm {tc:.1f}s)", flush=True)


def probe_scan(jax, jnp, batch=384, ks=(2, 4)):
    from of_dis_tpu.models import dis

    params, im_a, im_b = _op2_inputs(jax, jnp, batch)
    fw, fh = int(im_a.shape[3]), int(im_a.shape[2])

    for k in ks:
        @jax.jit
        def stepk(a, b, chk):
            def body(c, _):
                # tie the trip's INPUT to the carry with a runtime-zero
                # perturbation (chk is never NaN) — without it XLA hoists
                # the loop-invariant pipeline out of the scan and "scan-of
                # -4" measures ONE trip (observed: 47k pairs/s, same
                # 32.7 ms/launch as a single trip)
                eps = jnp.where(jnp.isnan(c), 1, 0).astype(a.dtype)
                out = dis.dis_flow_batched(a + eps, b, params, fw, fh,
                                           channels_last=False)
                return c + jnp.sum(out), None

            c, _ = jax.lax.scan(body, chk, None, length=k)
            return c

        t0 = time.perf_counter()
        _sync(stepk(im_a, im_b, jnp.float32(0)))
        tc = time.perf_counter() - t0
        iters = 6
        t0 = time.perf_counter()
        chk = jnp.float32(0)
        for _ in range(iters):
            chk = stepk(im_a, im_b, chk)
        _sync(chk)
        dt = time.perf_counter() - t0
        n_pairs = batch * k * iters
        print(f"op2 b={batch} scan-of-{k}: {n_pairs/dt:.0f} pairs/s "
              f"({dt/iters*1e3:.2f} ms/launch, "
              f"{dt/n_pairs*1e6:.1f} us/pair; compile+warm {tc:.1f}s)",
              flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    which = sys.argv[1:] or ["tiny", "batches", "scan"]
    if "tiny" in which:
        probe_tiny(jnp, jax)
    if "batches" in which:
        probe_batches(jax, jnp)
    if "scan" in which:
        probe_scan(jax, jnp)


if __name__ == "__main__":
    main()
