"""Device-op profile of the full batched pipeline on TPU.

Runs one 384-pair op-point-2 Sintel batch under jax.profiler, then parses
the trace and prints (a) total device time, (b) per-op-category totals,
(c) the biggest single HLO ops with their long names. This is how the
pipeline's relayout copies / dense-matmul waste / kernel shares were found
(see the bench history in git log).

Usage: python tools/profile_pipeline.py [batch] [op_point] [seq]
(third arg "seq": profile dis_sequence_batched with [batch] streams x 5
frames instead of the batched pair mode — VERDICT r3 item 6)
"""

import collections
import glob
import gzip
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    from of_dis_tpu.models import dis
    from of_dis_tpu.ops import pyramid
    from of_dis_tpu.params import op_point_params

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    op = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    h_org, w_org = 436, 1024
    # third arg "rgb": profile the noc=3 path (RGB op-3 attribution)
    noc = 3 if (len(sys.argv) > 3 and sys.argv[3] == "rgb") else 1
    params = op_point_params(w_org, op, nop=2, noc=noc, verbosity=0)
    rng = np.random.default_rng(0)
    # bench.py's pair generator: blurred noise + spatially-varying subpixel
    # motion. Blur matters (raw noise produces wild flows that defeat the
    # banded-warp / tiled-GN windows, profiling the fallbacks instead of the
    # production paths); the varying field matters (a uniform integer shift
    # lets the extraction cache skip its dot nearly always — flattering).
    import bench as _bench
    base, shift = _bench._make_pairs(rng, b, h_org, w_org, noc=noc)
    im_a = jax.vmap(lambda x: pyramid.pad_to_divisible(x, params.sc_f))(
        jnp.asarray(base))
    im_b = jax.vmap(lambda x: pyramid.pad_to_divisible(x, params.sc_f))(
        jnp.asarray(shift))
    seq = len(sys.argv) > 3 and sys.argv[3] == "seq"
    if len(sys.argv) > 3 and sys.argv[3] == "fb":
        # forward-backward merge mode: per-HLO attribution of the fbcon
        # overhead (backward grid optimize + bilinear backward splat)
        import dataclasses
        params = dataclasses.replace(params, usefbcon=True)
    if seq:
        # S=b streams x 5 frames: per-step device work == batch-b pair
        # mode, plus the warm-start carry — the difference IS the
        # sequence-mode overhead
        t_n = 5
        u, v = _bench._flow_field(h_org, w_org)
        fr = np.stack([np.clip(np.rint(_bench._warp_pairs(
            base[:b], k * u, k * v)), 0, 255).astype(np.uint8)
            for k in range(t_n)])
        frames = jax.vmap(jax.vmap(
            lambda x: pyramid.pad_to_divisible(x, params.sc_f)))(
            jnp.asarray(fr))
        fn0 = lambda x: dis.dis_sequence_batched(
            x, params, frames.shape[4], frames.shape[3])
        run = lambda: float(np.asarray(fn0(frames)[0, 0, 0, 0, 0]))
        b = b * (t_n - 1)      # pairs per trace for the us/pair line
    else:
        fn = lambda x, y: dis.dis_flow_batched(
            x, y, params, im_a.shape[3], im_a.shape[2], channels_last=False)
        run = lambda: float(np.asarray(fn(im_a, im_b)[0, 0, 0, 0]))
    run()   # compile + warm up

    trace_dir = "/tmp/of_dis_tpu_trace"
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        run()

    tr = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(tr) as f:
        data = json.load(f)
    ev = [e for e in data["traceEvents"]
          if e.get("ph") == "X" and isinstance(e.get("pid"), int)]
    # device pid: the one whose process_name mentions TPU
    pids = {e["pid"]: e["args"].get("name", "") for e in data["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = [p for p, name in pids.items() if "TPU" in name]
    ev = [e for e in ev if e["pid"] in dev
          and not e["name"].startswith(("jit_dis_flow_batched",
                                        "jit_dis_sequence_batched"))]
    tot = sum(e["dur"] for e in ev)
    print(f"device total: {tot/1e3:.2f} ms "
          f"({tot/b:.1f} us/pair at batch {b})")
    agg = collections.defaultdict(float)
    cnt = collections.Counter()
    for e in ev:
        name = re.sub(r"[.\d]+$", "", e["name"])
        agg[name] += e["dur"]
        cnt[name] += 1
    print("\nby op category:")
    for name, d in sorted(agg.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{d/1e3:9.2f} ms  x{cnt[name]:4d}  {name[:80]}")
    print("\nbiggest single ops:")
    for e in sorted(ev, key=lambda e: -e["dur"])[:12]:
        ln = e.get("args", {}).get("long_name", "")[:130]
        print(f"{e['dur']/1e3:8.2f} ms  {ln}")

    # ---- schedule-gap analysis (round 5): the wall-vs-device delta.
    # Per device track (tid): span = last end - first start, busy = summed
    # durations, idle = span - busy. The top gaps between consecutive ops
    # on the busiest track show WHERE the unattributed time sits.
    bytid = collections.defaultdict(list)
    for e in ev:
        bytid[(e["pid"], e["tid"])].append(e)
    tids = {t: n["args"].get("name", "") for t, n in (
        ((e["pid"], e["tid"]), e) for e in data["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "thread_name"
        and e.get("pid") in dev)}
    print("\nper-track busy/span:")
    main_track = None
    main_busy = -1.0
    for t, evs in sorted(bytid.items(),
                         key=lambda kv: -sum(e["dur"] for e in kv[1])):
        evs.sort(key=lambda e: e["ts"])
        busy = sum(e["dur"] for e in evs)
        span = evs[-1]["ts"] + evs[-1]["dur"] - evs[0]["ts"]
        print(f"  tid {t[1]:>4} ({tids.get(t, '?')[:40]:40s}) "
              f"busy {busy/1e3:8.2f} ms  span {span/1e3:8.2f} ms  "
              f"idle {(span-busy)/1e3:8.2f} ms  x{len(evs)}")
        if busy > main_busy:
            main_busy, main_track = busy, t
    evs = bytid[main_track]
    gaps = []
    for a, bnxt in zip(evs, evs[1:]):
        g = bnxt["ts"] - (a["ts"] + a["dur"])
        if g > 0:
            gaps.append((g, a["name"], bnxt["name"]))
    gaps.sort(reverse=True)
    n_gap = sum(g for g, _, _ in gaps)
    print(f"\ncompute-track gaps: {len(gaps)} totaling {n_gap/1e3:.2f} ms; "
          f"top 15:")
    for g, na, nb2 in gaps[:15]:
        print(f"{g/1e3:8.3f} ms  after {na[:50]:50s} before {nb2[:50]}")


if __name__ == "__main__":
    main()
