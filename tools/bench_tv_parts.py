"""Split the L-level TV refinement time into warp/derivs vs the fused
inner Pallas kernel, at a given batch. Usage: python tools/bench_tv_parts.py [batch] [level]"""

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

    from of_dis_tpu.ops import tv
    from of_dis_tpu.params import make_level_spec, op_point_params

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    sl = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    K = 8
    prm = op_point_params(1024, 2, nop=2, noc=1)
    spec = make_level_spec(sl, 1024, 448, prm)
    lh, lw = spec.height, spec.width
    n_inner = prm.tv_innerit * (sl + 1)
    rng = np.random.default_rng(0)
    wx = jnp.asarray(rng.random((B, lh, lw)), jnp.float32)
    wy = jnp.asarray(rng.random((B, lh, lw)), jnp.float32)
    i1 = jnp.asarray(rng.random((B, 1, lh, lw)), jnp.float32)
    i2 = jnp.asarray(rng.random((B, 1, lh, lw)), jnp.float32)

    noc = 1
    qa = 0.25 * prm.tv_alpha
    hd3 = prm.tv_delta * 0.5 / 3.0
    hg3 = prm.tv_gamma * 0.5 / 3.0
    bb = tv._pick_bb(B, lh, lw, noc)
    print(f"L{sl} {lh}x{lw} B={B} bb={bb} n_inner={n_inner}")

    def timeit(name, fn, *args):
        out = fn(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
        dt = (time.perf_counter() - t0) / K
        print(f"{name:34s} {dt*1e3:9.2f} ms/step ({dt/B*1e6:8.1f} us/pair)")

    @jax.jit
    def part_warp(wx, wy, i2):
        def one(i, wx):
            w_im2, mask = tv.warp_image_batched(i2, wx, wy, True, bb)
            return wx * (1.0 - 1e-12) + w_im2[:, 0] * 1e-12
        return jax.lax.fori_loop(0, K, one, wx)

    @jax.jit
    def part_derivs(wx, wy, i1, i2):
        w_im2, mask = tv.warp_image_batched(i2, wx, wy, True, bb)
        def one(i, w2):
            I = jax.vmap(tv.get_derivatives)(i1, w2)
            i_stack = jnp.stack(I, 0).transpose(0, 2, 1, 3, 4)
            return w2 * (1.0 - 1e-12) + i_stack[0].transpose(1, 0, 2, 3) * 1e-12
        return jax.lax.fori_loop(0, K, one, w_im2)

    @jax.jit
    def part_kernel(wx, wy, i1, i2):
        w_im2, mask = tv.warp_image_batched(i2, wx, wy, True, bb)
        I = jax.vmap(tv.get_derivatives)(i1, w_im2)
        i_stack = jnp.stack(I, 0).transpose(0, 2, 1, 3, 4)
        def one(i, carry):
            uu, vv = tv._of_inner_pallas_batched(
                carry[0], carry[1], mask, i_stack, bb=bb, noc=noc,
                quarter_alpha=qa, hd3=hd3, hg3=hg3, n_inner=n_inner,
                n_solver=prm.tv_solverit, omega=prm.tv_sor)
            return uu * (1.0 - 1e-12), vv
        return jax.lax.fori_loop(0, K, one, (wx, wy))

    @jax.jit
    def part_full(wx, wy, i1, i2):
        def one(i, carry):
            uu, vv = tv.ref_level_of_batched(
                carry[0], carry[1], i1, i2, alpha=prm.tv_alpha,
                gamma=prm.tv_gamma, delta=prm.tv_delta, n_inner=n_inner,
                n_solver=prm.tv_solverit, omega=prm.tv_sor)
            return uu * (1.0 - 1e-12), vv
        return jax.lax.fori_loop(0, K, one, (wx, wy))

    timeit("warp only", part_warp, wx, wy, i2)
    timeit("derivs+stack (w/o warp)", part_derivs, wx, wy, i1, i2)
    timeit("inner pallas kernel only", part_kernel, wx, wy, i1, i2)
    timeit("full ref_level_of_batched", part_full, wx, wy, i1, i2)


if __name__ == "__main__":
    main()
