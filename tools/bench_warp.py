"""Compare the TV warp formulations (MXU one-hot vs banded shifted-slab vs
packed gathers) at a given (batch, H, W) on the real TPU.

Usage: python tools/bench_warp.py [batch] [H] [W]
Used to calibrate the warp dispatch cost model in tv.warp_image_batched.
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

    from of_dis_tpu.ops import tv

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 224
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    K = 4
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.random((b, 1, h, w)), jnp.float32) * 255.0
    wx = jnp.asarray(rng.standard_normal((b, h, w)) * 1.5 + 2.5, jnp.float32)
    wy = jnp.asarray(rng.standard_normal((b, h, w)) * 0.8 + 1.0, jnp.float32)

    def timeit(name, fn):
        @jax.jit
        def chain(s, x, y):
            acc = jnp.float32(0)
            o = s
            for _ in range(K):
                o = fn(o, x, y)
                acc = acc + o[0, 0, 0, 0]
            return acc

        try:
            float(np.asarray(chain(src, wx, wy)))
        except Exception as e:
            print(f"{name:22s} FAILED: {type(e).__name__}: {e}")
            return
        t0 = time.perf_counter()
        float(np.asarray(chain(src, wx, wy)))
        dt = (time.perf_counter() - t0) / K
        print(f"{name:22s} {dt*1e3:8.3f} ms/warp ({dt/b*1e6:7.1f} us/pair)")

    def mxu(s, x, y):
        coeffs = tv._warp_coeffs(x, y)
        return tv.warp_image_mxu(s, coeffs)[0]

    def banded(s, x, y):
        return tv.warp_image_banded(s, x, y, tv._BANDED_WARP_R)

    def gathers(s, x, y):
        return tv._warp_gather_packed(s, x, y, tv._warp_coeffs(x, y))

    timeit("mxu one-hot", mxu)
    timeit("banded shifted-slab", banded)
    timeit("packed gathers", gathers)


if __name__ == "__main__":
    main()
