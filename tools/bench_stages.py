"""Per-stage TPU microbenchmarks for the op-point-2 Sintel pipeline.

Each stage is jitted separately with a K-iteration dependent chain inside the
jit (amortizes the ~27ms tunnel fetch latency of the axon platform, where
block_until_ready does not block: sync = host fetch of a dependent scalar).

Usage: python tools/bench_stages.py [batch]
"""

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

    from of_dis_tpu.models import dis
    from of_dis_tpu.ops import densify, patch_solver, pyramid, tv
    from of_dis_tpu.params import make_level_spec, op_point_params

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    K = 8  # chained iterations per timing run
    h_org, w_org = 436, 1024
    prm = op_point_params(w_org, 2, nop=2, noc=1)
    rng = np.random.default_rng(0)

    def timeit(name, fn, *args):
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf.ravel()[0]))  # force compile+run
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf.ravel()[0]))
        dt = (time.perf_counter() - t0) / K
        print(f"{name:40s} {dt*1e3:9.2f} ms/step  ({dt/B*1e6:8.1f} us/pair)",
              flush=True)
        return dt

    full_h = ((h_org + 31) // 32) * 32  # 448
    full_w = w_org
    im_a = jnp.asarray(rng.random((B, 1, full_h, full_w)), jnp.float32)
    im_b = jnp.asarray(rng.random((B, 1, full_h, full_w)), jnp.float32)

    # ---- pyramid (levels 0..5 with grads)
    @jax.jit
    def stage_pyr(a):
        def one(i, a):
            ims, dxs, dys = jax.vmap(
                lambda x: pyramid.build_pyramid(x, prm.sc_f, prm.p_samp_s))(a)
            return a + ims[0][:, :, prm.p_samp_s, prm.p_samp_s, None, None] * 1e-12
        return jax.lax.fori_loop(0, K, one, a)

    timeit("pyramid(sc_f=5, grads)", stage_pyr, im_a)

    # ---- per level stages
    for sl in (5, 4, 3):
        spec = make_level_spec(sl, full_w, full_h, prm)
        lw, lh = spec.width, spec.height
        pw, ph = lw + 2 * spec.pad, lh + 2 * spec.pad
        ia = jnp.asarray(rng.random((B, 1, ph, pw)), jnp.float32)
        dxa = jnp.asarray(rng.random((B, 1, ph, pw)), jnp.float32)
        dya = jnp.asarray(rng.random((B, 1, ph, pw)), jnp.float32)
        ib = jnp.asarray(rng.random((B, 1, ph, pw)), jnp.float32)
        n = spec.nopatches

        @jax.jit
        def stage_tpl(ia, dxa, dya):
            def one(i, c):
                tpl = jax.vmap(lambda a, dx, dy: patch_solver.extract_templates(
                    spec, prm, a, dx, dy))(ia, dxa, dya)
                return c + tpl.hes[:, 0, 0] * 1e-12
            return jax.lax.fori_loop(0, K, one, jnp.zeros((B,)))

        @jax.jit
        def stage_opt(ia, dxa, dya, ib):
            tpl = jax.vmap(lambda a, dx, dy: patch_solver.extract_templates(
                spec, prm, a, dx, dy))(ia, dxa, dya)
            p0 = jnp.zeros((B, n, 2), jnp.float32)

            def one(i, p0):
                res = patch_solver.optimize_level_batched(
                    spec, prm, ib, tpl, p0)
                return res.p * (1.0 - 1e-12)
            return jax.lax.fori_loop(0, K, one, p0)

        @jax.jit
        def stage_densify(ia, dxa, dya, ib):
            tpl = jax.vmap(lambda a, dx, dy: patch_solver.extract_templates(
                spec, prm, a, dx, dy))(ia, dxa, dya)
            p0 = jnp.zeros((B, n, 2), jnp.float32)
            res = patch_solver.optimize_level_batched(spec, prm, ib, tpl, p0)

            def one(i, c):
                mk = patch_solver.PatchResult
                fl = jax.vmap(lambda p, pt, pw: densify.aggregate_flow_dense(
                    spec, prm, mk(p, pt, pw, res.iters)))(
                    res.p, res.pt, res.pweight)
                return c + fl[:, 0, 0, 0] * 1e-12
            return jax.lax.fori_loop(0, K, one, jnp.zeros((B,)))

        timeit(f"L{sl} extract_templates (n={n})", stage_tpl, ia, dxa, dya)
        timeit(f"L{sl} optimize_level 12it", stage_opt, ia, dxa, dya, ib)
        timeit(f"L{sl} densify", stage_densify, ia, dxa, dya, ib)

        n_inner = prm.tv_innerit * (sl + 1)
        flow0 = jnp.asarray(rng.random((B, lh, lw, 2)), jnp.float32)
        i1 = ia[:, :, spec.pad:-spec.pad, spec.pad:-spec.pad]
        i2 = ib[:, :, spec.pad:-spec.pad, spec.pad:-spec.pad]

        @jax.jit
        def stage_tv(flow0, i1, i2):
            def one(i, f):
                wx, wy = tv.ref_level_of_batched(
                    f[..., 0], f[..., 1], i1, i2, alpha=prm.tv_alpha,
                    gamma=prm.tv_gamma, delta=prm.tv_delta, n_inner=n_inner,
                    n_solver=prm.tv_solverit, omega=prm.tv_sor)
                return jnp.stack([wx, wy], axis=-1) * (1.0 - 1e-12)
            return jax.lax.fori_loop(0, K, one, flow0)

        timeit(f"L{sl} tv_refine (inner={n_inner})", stage_tv, flow0, i1, i2)

    # ---- final upscale x8
    flow3 = jnp.asarray(rng.random((B, full_h // 8, full_w // 8, 2)), jnp.float32)

    @jax.jit
    def stage_up(f):
        def one(i, c):
            u = jax.vmap(lambda x: dis.upscale_output(x, 3, full_h, full_w))(f)
            return c + u[:, 0, 0, 0] * 1e-12
        return jax.lax.fori_loop(0, K, one, jnp.zeros((B,)))

    timeit("upscale x8 to full", stage_up, flow3)


if __name__ == "__main__":
    main()
