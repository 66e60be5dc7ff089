"""Run every pipeline mode once on the real TPU with small images.

Catches Mosaic/XLA-TPU lowering problems in configurations the bench does
not exercise (RGB data term in the Pallas kernel, depth kernel, fbcon,
op-points 1/3/4, gradient input, sequence scan, explicit-params form).
"""

import sys
import time

import numpy as np

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    from of_dis_tpu.models import dis
    from of_dis_tpu.ops import pyramid
    from of_dis_tpu.params import DISParams, op_point_params

    rng = np.random.default_rng(0)
    h, w = 128, 192

    def pair(c, shift, ph=None, pw=None):
        ph = h if ph is None else ph
        pw = w if pw is None else pw
        big = rng.random((c, ph + 40, pw + 40)).astype(np.float32) * 255
        # separable smoothing
        k = np.ones(7, np.float32) / 7.0
        big = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, big)
        big = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 2, big)
        a = big[:, 20:20 + ph, 20:20 + pw]
        sx, sy = shift
        b = big[:, 20 - sy:20 - sy + ph, 20 - sx:20 - sx + pw]
        return jnp.asarray(a), jnp.asarray(b)

    def run(name, prm, a, b, expect=None, tol=0.6):
        ap = pyramid.pad_to_divisible(a, prm.sc_f)
        bp = pyramid.pad_to_divisible(b, prm.sc_f)
        fh, fw = ap.shape[1], ap.shape[2]
        t0 = time.perf_counter()
        out = np.asarray(dis.dis_flow_full(ap, bp, prm, fw, fh))
        dt = time.perf_counter() - t0
        med = np.median(out[16:-16, 16:-16].reshape(-1, out.shape[-1]),
                        axis=0)
        status = "OK"
        if expect is not None:
            if not all(abs(m - e) < tol for m, e in zip(med, expect)):
                status = f"MISMATCH expect {expect}"
        print(f"{name:28s} {status}  med={np.round(med, 3)} "
              f"compile+run={dt:.1f}s", flush=True)

    a1, b1 = pair(1, (2, 1))
    a3, b3 = pair(3, (2, 1))
    s1, s2 = pair(1, (-3, 0))

    for op in (1, 2, 3, 4):
        run(f"OF_INT op{op}", op_point_params(w, op), a1, b1, (2, 1))
    run("OF_RGB op2", op_point_params(w, 2, noc=3), a3, b3, (2, 1))
    run("DE_INT op2", op_point_params(w, 2, nop=1), s1, s2, (-3,))
    run("DE_RGB op2", op_point_params(w, 2, nop=1, noc=3),
        *pair(3, (-3, 0)), (-3,))
    prm_fb = DISParams(sc_f=3, sc_l=1, max_iter=12, min_iter=12, p_samp_s=8,
                       patove=0.4, usefbcon=True, usetvref=True)
    run("fbcon + TV", prm_fb, a1, b1, (2, 1))
    prm_l1 = DISParams(sc_f=3, sc_l=1, max_iter=12, min_iter=12, p_samp_s=8,
                       patove=0.4, costfct=1, usetvref=True)
    run("L1 cost", prm_l1, a1, b1, (2, 1))

    # tiled windowed GN kernel + banded warp: a fine level too large for the
    # whole-plane kernel (the op-3/4 hot path, exercised at real scale)
    at, bt = pair(1, (2, 1), ph=224, pw=512)
    prm_t = DISParams(sc_f=2, sc_l=0, max_iter=16, min_iter=16, p_samp_s=12,
                      patove=0.75, usetvref=True)
    run("tiled GN fine level", prm_t, at, bt, (2, 1))

    # sequence mode with warm start (scan)
    prm = DISParams(sc_f=3, sc_l=1, max_iter=8, min_iter=8, p_samp_s=8,
                    patove=0.4, usetvref=True)
    frames = []
    big = rng.random((1, h + 60, w + 60)).astype(np.float32) * 255
    k = np.ones(7, np.float32) / 7.0
    big = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, big)
    big = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 2, big)
    for t in range(3):
        frames.append(big[:, 30 - t:30 - t + h, 30 - 2 * t:30 - 2 * t + w])
    fr = jnp.asarray(np.stack(frames))
    fr = jax.vmap(lambda x: pyramid.pad_to_divisible(x, prm.sc_f))(fr)
    fh, fw = fr.shape[2], fr.shape[3]
    t0 = time.perf_counter()
    flows = np.asarray(dis.dis_sequence(fr, prm, fw, fh))
    med = np.median(flows[1, 16:-16, 16:-16].reshape(-1, 2), axis=0)
    ok = abs(med[0] - 2) < 0.6 and abs(med[1] - 1) < 0.6
    print(f"{'sequence (scan+warmstart)':28s} {'OK' if ok else 'MISMATCH'}  "
          f"med={np.round(med, 3)} compile+run={time.perf_counter()-t0:.1f}s",
          flush=True)


if __name__ == "__main__":
    main()
