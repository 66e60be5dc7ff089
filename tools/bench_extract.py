"""Isolate the cost of extract_bilinear_mxu's components at L3 Sintel shape."""
import time

import numpy as np

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from of_dis_tpu.ops import patch_solver
    from of_dis_tpu.params import grid_points, make_level_spec, op_point_params

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    import os

    B, K = int(os.environ.get("XB", "64")), 12
    prm = op_point_params(1024, 2)
    spec = make_level_spec(3, 1024, 448, prm)
    hp, wp = spec.padded_height, spec.padded_width
    n = spec.nopatches
    psz, pad = prm.p_samp_s, spec.pad
    w1 = psz + 1
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
        print(f"{name:34s} {dt*1e3:8.2f} ms/iter", flush=True)

    @jax.jit
    def full(im, pts):
        planes = jax.vmap(lambda x: patch_solver._shifted_planes(x, psz))(im)

        def one(i, p):
            out = jax.vmap(lambda hi, lo, pt: patch_solver.extract_bilinear_mxu(
                (hi, lo), pt, psz, pad, 1, hp, wp))(planes[0], planes[1], p)
            return p + out[:, 0, :, None] * 1e-12
        return jax.lax.fori_loop(0, K, one, pts)

    @jax.jit
    def matmul_only(im, pts):
        planes = jax.vmap(lambda x: patch_solver._shifted_planes(x, psz))(im)

        def ex(hi, lo, pt):
            pos_c = jnp.ceil(pt + 1e-5).astype(jnp.int32)
            sx = pos_c[:, 0] - psz // 2 - 1 + pad
            cols = jax.lax.broadcasted_iota(jnp.int32, (wp, n), 0)
            onehot = (cols == sx[None, :]).astype(jnp.bfloat16)
            t = (jnp.dot(hi, onehot, preferred_element_type=jnp.float32)
                 + jnp.dot(lo, onehot, preferred_element_type=jnp.float32))
            return t  # (w1*hp, n)

        def one(i, p):
            t = jax.vmap(ex)(planes[0], planes[1], p)
            return p + t[:, 0, :, None] * 1e-12
        return jax.lax.fori_loop(0, K, one, pts)

    t_big = jnp.asarray(rng.random((B, w1, 1, hp, n)), jnp.float32)

    @jax.jit
    def gather_only(t_big, pts):
        def ex(t, pt):
            pos_c = jnp.ceil(pt + 1e-5).astype(jnp.int32)
            sy = pos_c[:, 1] - psz // 2 - 1 + pad
            idx = sy[None, None, None, :] + jnp.arange(w1)[None, None, :, None]
            g = jnp.take_along_axis(
                t, jnp.broadcast_to(idx, (w1, 1, w1, n)), axis=2)
            return g  # (w1, 1, w1, n)

        def one(i, p):
            g = jax.vmap(ex)(t_big, p)
            return p + g[:, 0, 0, 0, :, None] * 1e-12
        return jax.lax.fori_loop(0, K, one, pts)

    timeit("full extract", full, im, pts)
    timeit("matmul only", matmul_only, im, pts)
    timeit("gather only", gather_only, t_big, pts)


if __name__ == "__main__":
    main()
