"""Golden parity ON THE TPU: run the CLI modes on the real chip against the
committed reference-binary goldens and print the EPE ratios.

The pytest golden suite runs on CPU (exact XLA paths); this checks that the
TPU kernels (bf16 hi/lo extraction, banded warp, red-black SOR, Mosaic
lowerings) stay inside the same <=1% budget. Run on TPU; output is the
SMOKE-style artifact recorded per round.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    from of_dis_tpu import cli
    from of_dis_tpu.utils import io

    g = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "goldens")

    def epe_ratio(ours, ref):
        d = np.hypot(ours[..., 0] - ref[..., 0], ours[..., 1] - ref[..., 1])
        return d.mean() / np.hypot(ref[..., 0], ref[..., 1]).mean()

    cases = [
        # op-1 matches to float noise on CPU (sweep-order-free pipeline)
        # but the TPU extraction reconstructs f32 from bf16 hi/lo planes
        # (~1e-3 absolute), so it gets the standard 1% budget here
        ("OF_INT op1", "run_OF_INT", "a.png", "b.png", "1",
         "of_int_op1.flo", 0.01),
        ("OF_INT op2", "run_OF_INT", "a.png", "b.png", "2",
         "of_int_op2.flo", 0.01),
        ("OF_INT op3", "run_OF_INT", "a.png", "b.png", "3",
         "of_int_op3.flo", 0.01),
        ("OF_INT op4", "run_OF_INT", "a.png", "b.png", "4",
         "of_int_op4.flo", 0.01),
        ("OF_RGB op2", "run_OF_RGB", "ac.png", "bc.png", "2",
         "of_rgb_op2.flo", 0.01),
        ("OF_RGB op3", "run_OF_RGB", "ac.png", "bc.png", "3",
         "of_rgb_op3.flo", 0.01),
        ("OF_GRD op2", "run_OF_GRD", "a.png", "b.png", "2",
         "of_grd_op2.flo", 0.01),
    ]
    fails = 0
    for name, mode, i1, i2, op, golden, budget in cases:
        out = f"/tmp/tpu_parity_{golden}"
        cli.main([mode, os.path.join(g, i1), os.path.join(g, i2), out, op,
                  "--quiet"])
        r = epe_ratio(io.read_flo(out), io.read_flo(os.path.join(g, golden)))
        ok = r < budget
        fails += 0 if ok else 1
        print(f"{name:14s} {'OK' if ok else 'FAIL'}  epe_ratio={r:.5f} "
              f"(budget {budget})", flush=True)

    # op-1 again under OF_DIS_TPU_EXACT_EXTRACT=1 (3-term bf16 plane
    # split) — chip-side compile + no-harm coverage of the exact mode.
    # Measured finding (round 3): for u8-sourced pyramids the default
    # 2-term hi/lo split is ALREADY bit-exact through level >=4 (level
    # values need 8+2*lv significand bits; two bf16 terms cover ~16), so
    # on these goldens the exact mode reproduces the default result
    # bit-for-bit and op-1's ~0.7% TPU delta is iteration-order float
    # noise through the data-dependent early-stop predicate, NOT
    # extraction error. The knob matters only for float/deep-pyramid
    # inputs (>16 significand bits per value).
    import jax as _jax
    os.environ["OF_DIS_TPU_EXACT_EXTRACT"] = "1"
    _jax.clear_caches()
    try:
        out = "/tmp/tpu_parity_of_int_op1_exact.flo"
        cli.main(["run_OF_INT", os.path.join(g, "a.png"),
                  os.path.join(g, "b.png"), out, "1", "--quiet"])
        r = epe_ratio(io.read_flo(out),
                      io.read_flo(os.path.join(g, "of_int_op1.flo")))
        ok = r < 0.01
        fails += 0 if ok else 1
        print(f"{'OF_INT op1 f32':14s} {'OK' if ok else 'FAIL'}  "
              f"epe_ratio={r:.5f} (budget 0.01; bit-equal to default on "
              f"u8 pyramids — see tool docstring)", flush=True)
    finally:
        del os.environ["OF_DIS_TPU_EXACT_EXTRACT"]
        _jax.clear_caches()

    # depth (.pfm, mean-abs ratio); the fbcon row uses the full 20-param
    # form of tests/test_golden_parity.py (usefbcon=1 backward splat)
    fb20 = ("3 1 12 12 0.05 0.95 0 8 0.4 1 1 0 1 10 10 5 1 3 1.6 0".split())
    for name, mode, i1, i2, op, golden in [
            ("DE_INT op2", "run_DE_INT", "a.png", "bs.png", ["2"],
             "de_int_op2.pfm"),
            ("DE_INT op3", "run_DE_INT", "a.png", "bs.png", ["3"],
             "de_int_op3.pfm"),
            ("DE_INT fbcon", "run_DE_INT", "a.png", "bs.png", fb20,
             "de_int_l2_fb.pfm"),
            ("DE_RGB op2", "run_DE_RGB", "asc.png", "bsc.png", ["2"],
             "de_rgb_op2.pfm"),
            ("DE_GRD op2", "run_DE_GRD", "a.png", "bs.png", ["2"],
             "de_grd_op2.pfm")]:
        out = f"/tmp/tpu_parity_{golden}"
        cli.main([mode, os.path.join(g, i1), os.path.join(g, i2), out, *op,
                  "--quiet"])
        ours = io.read_pfm(out)
        ref = io.read_pfm(os.path.join(g, golden))
        r = np.abs(ours - ref).mean() / np.abs(ref).mean()
        ok = r < 0.01
        fails += 0 if ok else 1
        print(f"{name:14s} {'OK' if ok else 'FAIL'}  ratio={r:.5f} "
              f"(budget 0.01)", flush=True)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
