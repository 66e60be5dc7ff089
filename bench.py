"""Benchmark: batched DIS optical-flow throughput at op-point 2 on
Sintel-shaped (1024x436) grayscale frame pairs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline north star (BASELINE.md): >=200 frame-pairs/sec/chip on TPU v5e-1.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from of_dis_tpu.models import dis
    from of_dis_tpu.ops import pyramid
    from of_dis_tpu.params import op_point_params

    h_org, w_org = 436, 1024
    params = op_point_params(w_org, 2, nop=2, noc=1, verbosity=0)

    rng = np.random.default_rng(0)
    batch = 16
    base = rng.random((batch, 1, h_org, w_org)).astype(np.float32) * 255.0
    # smooth the noise so patch optimization does realistic work
    k = np.ones((5, 5), np.float32) / 25.0
    import scipy.signal as sig
    base = np.stack([[sig.convolve2d(im[0], k, mode="same")] for im in base])
    shift = np.roll(base, shift=(2, 3), axis=(2, 3))

    # pad_to_divisible expects (C,H,W); vmap it over the batch
    im_a = jax.vmap(lambda x: pyramid.pad_to_divisible(x, params.sc_f))(
        jnp.asarray(base))
    im_b = jax.vmap(lambda x: pyramid.pad_to_divisible(x, params.sc_f))(
        jnp.asarray(shift))
    full_h, full_w = im_a.shape[2], im_a.shape[3]

    fn = lambda a, b: dis.dis_flow_batched(a, b, params, full_w, full_h)
    # compile + warm up
    out = fn(im_a, im_b)
    out.block_until_ready()

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(im_a, im_b)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    pairs_per_sec = batch * iters / dt

    print(json.dumps({
        "metric": "sintel_1024x436_op2_pairs_per_sec",
        "value": round(pairs_per_sec, 2),
        "unit": "frame-pairs/s",
        "vs_baseline": round(pairs_per_sec / 200.0, 3),
    }))


if __name__ == "__main__":
    main()
