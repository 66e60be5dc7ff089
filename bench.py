"""Benchmark: batched DIS optical-flow throughput at op-point 2 on
Sintel-shaped (1024x436) grayscale frame pairs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline north star (BASELINE.md): >=200 frame-pairs/sec/chip on TPU v5e-1.

Motion field: frame 2 is frame 1 backward-warped by a spatially-varying
subpixel flow (affine ramp + sinusoids, ~2.5/1.0 px mean). A uniform
integer shift (np.roll, the round-1/2 field) converges in 1-2 iterations
and then never crosses a pixel cell, letting the fused kernels'
cross-iteration extraction cache skip their dominant dot almost every
iteration — flattering vs real video. The varying field keeps patches
crossing cells like real footage; `op3_nocache_pairs_per_sec` additionally
records op-3 with the cache disabled to bound its remaining contribution.

Timing notes:
  - On the axon-tunneled TPU platform `block_until_ready()` does not
    actually block, so every synchronization point here is a host fetch of
    a reduced value that depends on the full output buffer.
  - A persistent XLA compilation cache (.jax_cache/) makes repeat runs skip
    the one-time pipeline compile.
"""

import json
import os
import time

import numpy as np


def _sync(out):
    """Force execution to completion: fetch a scalar that depends on `out`."""
    return float(np.asarray(out[(0,) * out.ndim]))


def _flow_field(h, w, scale=1.0):
    """Spatially-varying subpixel motion (px): affine ramp + sinusoids.
    Mean ~(2.5, 1.0), +-~1.5 px variation across the frame."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    u = (2.5 + 0.8 * np.sin(2 * np.pi * yy / 180.0)
         + 0.5 * np.cos(2 * np.pi * xx / 260.0) + 0.4 * (xx / w - 0.5))
    v = (1.0 + 0.7 * np.sin(2 * np.pi * xx / 210.0)
         + 0.4 * (yy / h - 0.5))
    return u * scale, v * scale


def _remap_np(img, mx, my):
    """NumPy bilinear backward warp with edge clamp (cv2.remap fallback)."""
    h, w = img.shape
    x0 = np.clip(np.floor(mx).astype(np.int64), 0, w - 1)
    y0 = np.clip(np.floor(my).astype(np.int64), 0, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    fx = np.clip(mx - x0, 0.0, 1.0).astype(np.float32)
    fy = np.clip(my - y0, 0.0, 1.0).astype(np.float32)
    return ((1 - fy) * ((1 - fx) * img[y0, x0] + fx * img[y0, x1])
            + fy * ((1 - fx) * img[y1, x0] + fx * img[y1, x1]))


def _warp_pairs(base, u, v):
    """Backward-warp each (C,H,W) frame by (u, v): out(x) = in(x - f(x)),
    so the estimated flow of (base, out) is ~(u, v). Computes and returns
    float32 regardless of input dtype (callers quantize to u8)."""
    base = base.astype(np.float32)
    h, w = base.shape[2], base.shape[3]
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    mx, my = xx - u, yy - v
    out = np.empty_like(base)
    try:
        import cv2
    except ImportError:
        cv2 = None
    for i in range(base.shape[0]):
        for c in range(base.shape[1]):
            if cv2 is not None:
                out[i, c] = cv2.remap(base[i, c], mx, my, cv2.INTER_LINEAR,
                                      borderMode=cv2.BORDER_REFLECT)
            else:
                out[i, c] = _remap_np(base[i, c], mx, my)
    return out


def _blur(img):
    """7x7 sigma-2 Gaussian blur (numpy separable fallback without cv2)."""
    try:
        import cv2
        return cv2.GaussianBlur(img, (7, 7), 2.0)
    except ImportError:
        x = np.arange(-3, 4, dtype=np.float32)
        k = np.exp(-x * x / (2 * 2.0 ** 2))
        k /= k.sum()
        p = np.pad(img, 3, mode="reflect")
        p = np.apply_along_axis(lambda r: np.convolve(r, k, "valid"), 1, p)
        return np.apply_along_axis(
            lambda r: np.convolve(r, k, "valid"), 0, p).astype(np.float32)


def _make_pairs(rng, batch, h, w, noc=1, flow_scale=1.0):
    """u8 frame pairs (like real video: PNG frames are 8-bit — the sensor
    quantizes each frame independently, so both the base and the warped
    frame are rounded to u8 AFTER the subpixel warp). The u8 dtype also
    exercises the pyramid's exact single-dot bf16 ingestion fast path —
    the production path for image input."""
    base = rng.random((batch, noc, h, w)).astype(np.float32) * 255.0
    for i in range(batch):
        for c in range(noc):
            base[i, c] = _blur(base[i, c])
    u, v = _flow_field(h, w, flow_scale)
    shift = _warp_pairs(base, u, v)
    to_u8 = lambda x: np.clip(np.rint(x), 0, 255).astype(np.uint8)
    return to_u8(base), to_u8(shift)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    from of_dis_tpu.models import dis
    from of_dis_tpu.ops import pyramid
    from of_dis_tpu.params import op_point_params

    h_org, w_org = 436, 1024
    params = op_point_params(w_org, 2, nop=2, noc=1, verbosity=0)

    rng = np.random.default_rng(0)
    batch = int(os.environ.get("BENCH_BATCH", "384"))
    base, shift = _make_pairs(rng, batch, h_org, w_org)

    # pad_to_divisible expects (C,H,W); vmap it over the batch
    im_a = jax.vmap(lambda x: pyramid.pad_to_divisible(x, params.sc_f))(
        jnp.asarray(base))
    im_b = jax.vmap(lambda x: pyramid.pad_to_divisible(x, params.sc_f))(
        jnp.asarray(shift))
    full_h, full_w = im_a.shape[2], im_a.shape[3]
    im_a = jax.device_put(im_a)
    im_b = jax.device_put(im_b)
    _sync(im_a)

    # BENCH_SCAN batches run inside ONE executable (lax.scan): the round-5
    # gap analysis showed the op-2 device trace has ZERO schedule gaps
    # (busy == span) and each executable launch costs ~2.2 ms of
    # client/tunnel overhead on this rig (31.2 ms wall vs 29.0 ms/trip
    # inside a scan) — the scan amortizes that launch tax exactly like a
    # production server dispatching multi-batch superbatches. Each trip's
    # input is tied to the carry by a runtime-zero perturbation (chk is
    # never NaN), without which XLA hoists the loop-invariant pipeline out
    # of the scan and one trip masquerades as K. The perturbation's u8
    # add costs ~0.3 ms/trip (~1%) AGAINST us — the number is a slight
    # under-report. BENCH_SCAN=1 restores the one-batch-per-launch loop.
    scan_k = int(os.environ.get("BENCH_SCAN", "4"))

    @jax.jit
    def step(a, b, chk):
        """scan_k full batched runs + a checksum that depends on every
        output element. Chaining chk through launches lets the device
        stream with a single host fetch at the very end — a per-iteration
        dependent-scalar fetch serializes a ~30ms tunnel round trip into
        the device queue (measured with jax.profiler). Only the checksum
        is returned (measured identical to also returning the flow batch —
        a jit output is a zero-copy buffer reference); it still forces the
        full pipeline including the full-res output upsample write (a
        custom call — XLA cannot elide its output)."""
        def body(c, _):
            eps = jnp.where(jnp.isnan(c), 1, 0).astype(a.dtype)
            out = dis.dis_flow_batched(a + eps, b, params, full_w, full_h,
                                       channels_last=False)
            return c + jnp.sum(out), None

        if scan_k == 1:
            return body(chk, None)[0]
        c, _ = jax.lax.scan(body, chk, None, length=scan_k)
        return c

    # compile + warm up (includes one full execution, forced by the fetch)
    chk = step(im_a, im_b, jnp.zeros((), jnp.float32))
    _sync(chk)

    iters = int(os.environ.get("BENCH_ITERS", "6"))
    t0 = time.perf_counter()
    chk = jnp.zeros((), jnp.float32)
    for i in range(iters):
        chk = step(im_a, im_b, chk) if i % 2 == 0 else step(
            im_b, im_a, chk)
    _sync(chk)
    dt = time.perf_counter() - t0
    pairs_per_sec = batch * scan_k * iters / dt

    # secondary metrics (same JSON line): small-batch loops over the other
    # perf-relevant regimes so regressions there are visible in the recorded
    # bench, not just op-2. Disable with BENCH_SECONDARY=0. Each secondary
    # runs under a wall-clock budget (BENCH_TIME_BUDGET seconds, default
    # 2400): when cold compiles eat the budget, the remaining secondaries
    # are skipped (recorded as "skipped (time budget)") instead of risking
    # the whole bench line to an external timeout; a failing secondary
    # likewise records its error without losing the primary metric.
    secondary = {}
    bench_t0 = time.perf_counter()
    time_budget = float(os.environ.get("BENCH_TIME_BUDGET", "2400"))

    def _secondary(name, thunk):
        if time.perf_counter() - bench_t0 > time_budget:
            secondary[name] = "skipped (time budget)"
            return
        try:
            secondary[name] = thunk()
        except Exception as e:  # pragma: no cover - defensive recording
            secondary[name] = f"error: {type(e).__name__}: {e}"

    def _measure(p, a_np, b_np, bsz, its):
        a = jax.vmap(lambda x: pyramid.pad_to_divisible(x, p.sc_f))(
            jnp.asarray(a_np[:bsz]))
        b = jax.vmap(lambda x: pyramid.pad_to_divisible(x, p.sc_f))(
            jnp.asarray(b_np[:bsz]))
        fh, fw = int(a.shape[2]), int(a.shape[3])

        @jax.jit
        def stepk(x, y, chk):
            out = dis.dis_flow_batched(x, y, p, fw, fh, channels_last=False)
            return chk + jnp.sum(out[:, :, ::64, ::64])

        _sync(stepk(a, b, jnp.zeros((), jnp.float32)))
        t0 = time.perf_counter()
        chk = jnp.zeros((), jnp.float32)
        for _ in range(its):
            chk = stepk(a, b, chk)
        _sync(chk)
        return round(bsz * its / (time.perf_counter() - t0), 2)

    if os.environ.get("BENCH_SECONDARY", "1") != "0":
        # op-1 (the DIS paper's 600 Hz headline regime,
        # run_dense.cpp:240-247); same large-batch regime as op-2
        p1 = op_point_params(w_org, 1, nop=2, noc=1, verbosity=0)
        _secondary("op1_pairs_per_sec",
                   lambda: _measure(p1, base, shift, min(batch, 384), 6))

        p3 = op_point_params(w_org, 3, nop=2, noc=1, verbosity=0)
        _secondary("op3_pairs_per_sec",
                   lambda: _measure(p3, base, shift, min(batch, 8), 4))

        # op-3 with the cross-iteration extraction cache disabled: bounds
        # the cache's contribution to the op-3 number (the knob is read at
        # trace time, so drop the trace caches to force a re-trace; the
        # persistent .jax_cache still covers the recompile across rounds)
        def _op3_nocache():
            os.environ["OF_DIS_TPU_NO_EXTRACT_CACHE"] = "1"
            jax.clear_caches()
            try:
                return _measure(p3, base, shift, min(batch, 8), 4)
            finally:
                del os.environ["OF_DIS_TPU_NO_EXTRACT_CACHE"]
                jax.clear_caches()

        _secondary("op3_nocache_pairs_per_sec", _op3_nocache)

        # op-4 (128-iteration max-quality regime)
        p4 = op_point_params(w_org, 4, nop=2, noc=1, verbosity=0)
        _secondary("op4_pairs_per_sec",
                   lambda: _measure(p4, base, shift, min(batch, 4), 2))

        # RGB op-3 (the fine-level noc=3 path); batch 8 = the measured
        # op-3 sweet spot, 3 iters for a less noisy sample
        b3 = min(batch, 8)
        base3, shift3 = _make_pairs(rng, b3, h_org, w_org, noc=3)
        p3c = op_point_params(w_org, 3, nop=2, noc=3, verbosity=0)
        _secondary("rgb_op3_pairs_per_sec",
                   lambda: _measure(p3c, base3, shift3, b3, 3))

        # RGB op-2 (BASELINE.md config 2 at the headline op-point): the
        # fused whole-plane kernels at noc=3, batch sized for ~3x the
        # per-pair device cost of INT op-2
        def _rgb_op2():
            b2 = min(batch, 96)
            base2, shift2 = _make_pairs(rng, b2, h_org, w_org, noc=3)
            p2c = op_point_params(w_org, 2, nop=2, noc=3, verbosity=0)
            return _measure(p2c, base2, shift2, b2, 4)

        _secondary("rgb_op2_pairs_per_sec", _rgb_op2)

        # depth op-2 (1-D disparity; left camera clamps >=0 shifts to zero,
        # so use a negative-x disparity field). Batch 256: depth device
        # time is ~63us/pair, so small batches are dispatch-bound (batch
        # 64 measured 8.3k pairs/s vs 12.9k at 256)
        u, v = _flow_field(h_org, w_org)
        based = base[:256]
        shiftd = np.clip(np.rint(_warp_pairs(
            based, -np.abs(u), np.zeros_like(v))), 0, 255).astype(np.uint8)
        pd = op_point_params(w_org, 2, nop=1, noc=1, verbosity=0)
        _secondary("de_op2_pairs_per_sec",
                   lambda: _measure(pd, based, shiftd, min(batch, 256), 4))

        # depth op-3 (1-D tiled GN fine levels — the regime most sensitive
        # to the in-kernel template extraction path)
        pd3 = op_point_params(w_org, 3, nop=1, noc=1, verbosity=0)
        _secondary("de_op3_pairs_per_sec",
                   lambda: _measure(pd3, based, shiftd, min(batch, 8), 4))

        # RGB depth op-2 (BASELINE.md config 4: run_DE_RGB)
        def _de_rgb_op2():
            bd = min(batch, 96)
            based3, _ = _make_pairs(rng, bd, h_org, w_org, noc=3)
            shiftd3 = np.clip(np.rint(_warp_pairs(
                based3, -np.abs(u), np.zeros_like(v))),
                0, 255).astype(np.uint8)
            pdc = op_point_params(w_org, 2, nop=1, noc=3, verbosity=0)
            return _measure(pdc, based3, shiftd3, bd, 4)

        _secondary("de_rgb_op2_pairs_per_sec", _de_rgb_op2)

        # forward-backward merge at op-2 (BASELINE.md config 3: both
        # directions optimized per scale + bilinear backward splat)
        import dataclasses
        pfb = dataclasses.replace(params, usefbcon=True)
        _secondary("fbcon_op2_pairs_per_sec",
                   lambda: _measure(pfb, base, shift, min(batch, 64), 4))

        # 1080p op-2 (frames >Sintel: the row-tiled banded warp and the
        # tiled GN windows at full-HD level sizes)
        def _hd():
            bhd = min(batch, 32)
            base_hd, shift_hd = _make_pairs(rng, bhd, 1080, 1920)
            p2hd = op_point_params(1920, 2, nop=2, noc=1, verbosity=0)
            return _measure(p2hd, base_hd, shift_hd, bhd, 3)

        _secondary("op2_1080p_pairs_per_sec", _hd)

        # sequence mode at op-3: S streams in lockstep, the scan carrying
        # warm starts (run_dense.cpp:356-379's init-flow hook)
        def _seq():
            s_n, t_n = 4, 9
            u1, v1 = _flow_field(h_org, w_org)
            seq = np.stack([
                np.clip(np.rint(_warp_pairs(base[:s_n], k * u1, k * v1)),
                        0, 255).astype(np.uint8) for k in range(t_n)])
            p3s = op_point_params(w_org, 3, nop=2, noc=1, verbosity=0)
            fr = jax.vmap(jax.vmap(
                lambda x: pyramid.pad_to_divisible(x, p3s.sc_f)))(
                jnp.asarray(seq))
            fh, fw = int(fr.shape[3]), int(fr.shape[4])

            @jax.jit
            def seq_step(x, chk):
                out = dis.dis_sequence_batched(x, p3s, fw, fh)
                return chk + jnp.sum(out[:, :, :, ::64, ::64])

            _sync(seq_step(fr, jnp.zeros((), jnp.float32)))
            t0 = time.perf_counter()
            chk = jnp.zeros((), jnp.float32)
            for _ in range(2):
                chk = seq_step(fr, chk)
            _sync(chk)
            return round(s_n * (t_n - 1) * 2 / (time.perf_counter() - t0), 2)

        _secondary("seq_op3_pairs_per_sec", _seq)

        # sequence SERVING (pipeline --streams): the full video-serving
        # path — disk decode, S=4 warm-start stream lanes, async .flo
        # writes — not just the device scan. End-to-end wall incl. I/O.
        def _seq_serving():
            import shutil
            import tempfile

            from of_dis_tpu import pipeline as pl

            tmp = tempfile.mkdtemp(prefix="bench_seq_")
            try:
                fdir = os.path.join(tmp, "frames")
                odir = os.path.join(tmp, "out")
                os.makedirs(fdir)
                u1, v1 = _flow_field(h_org, w_org)
                try:
                    import cv2
                    for t in range(33):
                        fr = np.clip(np.rint(_warp_pairs(
                            base[:1], t * 0.7 * u1, t * 0.7 * v1)[0, 0]),
                            0, 255).astype(np.uint8)
                        cv2.imwrite(os.path.join(fdir, f"f{t:04d}.png"), fr)
                except ImportError:
                    return "skipped (no cv2)"
                # warm the compile outside the timed run
                pl.run_pipeline(fdir, odir, op_point=3, streams=4,
                                verbose=False)
                shutil.rmtree(odir)
                t0 = time.perf_counter()
                n = pl.run_pipeline(fdir, odir, op_point=3, streams=4,
                                    verbose=False)
                return round(n / (time.perf_counter() - t0), 2)
            finally:
                shutil.rmtree(tmp, ignore_errors=True)

        _secondary("seq_serving_pairs_per_sec", _seq_serving)

    print(json.dumps({
        "metric": "sintel_1024x436_op2_pairs_per_sec",
        "value": round(pairs_per_sec, 2),
        "unit": "frame-pairs/s",
        "vs_baseline": round(pairs_per_sec / 200.0, 3),
        **({"secondary": secondary} if secondary else {}),
    }))


if __name__ == "__main__":
    main()
