"""Isolate the cost of extract_bilinear_mxu_batched's components at a given
Sintel level shape. Usage: XB=384 python tools/bench_extract.py [level]"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    from of_dis_tpu.ops import patch_solver as ps
    from of_dis_tpu.params import grid_points, make_level_spec, op_point_params

    B, K = int(os.environ.get("XB", "64")), 12
    sl = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    prm = op_point_params(1024, 2)
    spec = make_level_spec(sl, 1024, 448, prm)
    hp, wp = spec.padded_height, spec.padded_width
    n = spec.nopatches
    psz, pad = prm.p_samp_s, spec.pad
    w1 = psz + 1
    print(f"L{sl}: hp={hp} wp={wp} n={n} B={B}")
    rng = np.random.default_rng(0)
    im = jnp.asarray(rng.random((B, 1, hp, wp)), jnp.float32)
    xs, ys = grid_points(spec)
    pts_ref = np.stack([np.asarray(xs, np.float32),
                        np.asarray(ys, np.float32)], axis=1)
    pts = jnp.asarray(np.tile(pts_ref[None], (B, 1, 1))
                      + rng.random((B, n, 2)).astype(np.float32))

    def timeit(name, fn, *args):
        out = fn(*args)
        float(np.asarray(out.ravel()[0]))
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(out.ravel()[0]))
        dt = (time.perf_counter() - t0) / K
        print(f"{name:34s} {dt*1e3:8.2f} ms/iter ({dt/B*1e6:7.1f} us/pair)",
              flush=True)

    @jax.jit
    def full(im, pts):
        planes = jax.vmap(lambda x: ps._shifted_planes(x, psz))(im)

        def one(i, p):
            out = ps.extract_bilinear_mxu_batched(
                planes, p, psz, pad, 1, hp, wp, True)
            return p * (1.0 - 1e-12) + out[:, 0, :, None] * 1e-12
        return jax.lax.fori_loop(0, K, one, pts)

    @jax.jit
    def matmul_only(im, pts):
        hi, lo = jax.vmap(lambda x: ps._shifted_planes(x, psz))(im)[:2]
        dn = (((2,), (1,)), ((0,), (0,)))

        def one(i, p):
            pos_c = jnp.ceil(p + 1e-5).astype(jnp.int32)
            sx = pos_c[:, :, 0] - psz // 2 - 1 + pad
            cols = jax.lax.broadcasted_iota(jnp.int32, (B, wp, n), 1)
            onehot = (cols == sx[:, None, :]).astype(jnp.bfloat16)
            t = (jax.lax.dot_general(hi, onehot, dn,
                                     preferred_element_type=jnp.float32)
                 + jax.lax.dot_general(lo, onehot, dn,
                                       preferred_element_type=jnp.float32))
            return p * (1.0 - 1e-12) + t[:, 0, :, None] * 1e-12
        return jax.lax.fori_loop(0, K, one, pts)

    @jax.jit
    def bilerp_only(im, pts):
        hi, lo = jax.vmap(lambda x: ps._shifted_planes(x, psz))(im)[:2]
        dn = (((2,), (1,)), ((0,), (0,)))
        pos_c = jnp.ceil(pts + 1e-5).astype(jnp.int32)
        resid = pts - jnp.floor(pts)
        sx = pos_c[:, :, 0] - psz // 2 - 1 + pad
        sy = pos_c[:, :, 1] - psz // 2 - 1 + pad
        cols = jax.lax.broadcasted_iota(jnp.int32, (B, wp, n), 1)
        onehot = (cols == sx[:, None, :]).astype(jnp.bfloat16)
        t = (jax.lax.dot_general(hi, onehot, dn,
                                 preferred_element_type=jnp.float32)
             + jax.lax.dot_general(lo, onehot, dn,
                                   preferred_element_type=jnp.float32))
        t = t.reshape(B, w1, 1, hp, n)

        def one(i, carry):
            out = ps._bilerp_select_pallas(
                t, sy, resid[:, :, 1] * (1.0 + carry[0, 0, 0] * 1e-12),
                resid[:, :, 0], psz, 1, hp)
            return out
        return jax.lax.fori_loop(
            0, K, one, jnp.zeros((B, psz * psz, n), jnp.float32))

    timeit("full extract (dot+pallas bilerp)", full, im, pts)
    timeit("one-hot dot only", matmul_only, im, pts)
    if ps._bilerp_block(B, w1, 1, hp, n) is not None:
        timeit("pallas bilerp only", bilerp_only, im, pts)
    else:
        print("pallas bilerp only: skipped (t-slab over the VMEM budget "
              "at this level; the pure path is used there)")


if __name__ == "__main__":
    main()
