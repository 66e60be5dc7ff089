"""Streaming throughput pipeline: directories of frames -> .flo/.pfm files.

The production serving mode (BASELINE.md config 5): consecutive frame pairs
of a sequence are batched, decoded on host threads (the native C++ batch
decoder when built), double-buffered into device memory while the previous
batch computes, and written out asynchronously. The device never waits on
the host for steady-state batches.

All four reference modes serve (run_dense.cpp:186-431): run_OF_INT /
run_OF_RGB write .flo flow, run_DE_INT / run_DE_RGB write .pfm disparity
(consecutive frames treated as stereo pairs, negated bottom-up payload per
run_dense.cpp:421 + SavePFMFile).

Multi-chip: pass a `jax.sharding.Mesh` (or --mesh on the CLI) and each
batch's frame-pair axis is sharded over the mesh's devices — the per-pair
pipeline runs chip-local with zero hot-path collectives (see
parallel/mesh.py); host decode/writes stay double-buffered and device_put
feeds every chip its own shard.

Usage:
  python -m of_dis_tpu.pipeline FRAME_DIR OUT_DIR [--op N] [--batch B]
      [--mode run_OF_INT|run_OF_RGB|run_DE_INT|run_DE_RGB] [--mesh all|N]
      [--streams S]

--streams S enables warm-start sequence serving: S contiguous video
segments advance in lockstep, each lane warm-starting from its previous
pair's flow (measured faster than cold batches at S=4, PERF.md).

Frames are sorted lexicographically; pair t produces OUT_DIR/<frame_t>.flo
(.pfm for depth modes).
"""

from __future__ import annotations

import os
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from queue import Queue
from typing import List, Optional, Sequence

import numpy as np


def _decode_batch(paths: Sequence[str], channels: int) -> np.ndarray:
    """(B, C, H, W) uint8 via the native threaded decoder, else cv2/PIL.

    u8 is the device-transfer format (see host_decode); the native decoder
    emits it directly, the Python fallbacks decode f32 of 8-bit sources and
    cast (lossless)."""
    try:
        from of_dis_tpu.native import io as native_io
        return native_io.decode_batch(paths, channels, dtype=np.uint8)
    except Exception:
        from of_dis_tpu.utils import io as uio
        return np.stack([uio.load_image(p, channels) for p in paths]
                        ).astype(np.uint8)


class _ProducerError:
    """Queue sentinel carrying a decode exception from the producer thread."""

    def __init__(self, exc: BaseException):
        self.exc = exc


def run_pipeline(frame_dir: str, out_dir: str, *, op_point: int = 2,
                 batch: int = 0, mode: str = "run_OF_INT",
                 mesh=None, streams: int = 0, verbose: bool = True) -> int:
    """Stream a frame directory through the batched DIS pipeline.

    Returns the number of frame pairs processed. Batches overlap: host
    decode of batch k+1 and .flo/.pfm writes of batch k-1 run concurrently
    with device compute of batch k.

    streams=S switches to warm-start sequence serving: the video is split
    into S contiguous segments advancing in lockstep (one S-lane device
    step per time index), each lane warm-starting pair t+1 from its pair
    t's flow (dis.dis_step_warm; the reference's dormant init-flow hook,
    run_dense.cpp:356-379, oflow.cpp:215-217). Measured faster than cold
    batches at S=4 on op-3 content (PERF.md sequence-mode section); the
    flow outputs are warm-start outputs, not cold-batch outputs (better
    init, identical format).

    batch=0 picks the measured per-op-point sweet spot: large batches for
    the coarse op-points (device-bound, amortizes dispatch), 16 for op-3
    and 8 for op-4 — their fine-level glue (cond output relayouts) scales
    superlinearly with batch on TPU, so op-3 throughput PEAKS near batch
    16 (281 pairs/s vs 274 @8 and 191 @32 with in-kernel template
    extraction; PERF.md). With a mesh, the sweet spot applies PER CHIP
    (each chip runs its shard's pairs independently), so the resolved
    batch scales by the mesh size.

    mesh: optional jax.sharding.Mesh with one axis; each batch's leading
    frame-pair axis is sharded over it (batch is rounded up to a multiple
    of the mesh size; the ragged tail pads by repetition as before).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from of_dis_tpu.models import dis
    from of_dis_tpu.ops import pyramid
    from of_dis_tpu.params import op_point_params, pad_amounts
    from of_dis_tpu.utils import io as uio

    if mode not in ("run_OF_INT", "run_OF_RGB", "run_DE_INT", "run_DE_RGB"):
        raise ValueError(f"unknown pipeline mode {mode}")
    nop = 1 if "DE" in mode else 2
    noc = 3 if "RGB" in mode else 1
    n_dev = 1
    if mesh is not None:
        n_dev = int(np.prod(list(mesh.shape.values())))
    if not batch:
        batch = 8 if op_point >= 4 else (16 if op_point == 3 else 64)
        batch *= n_dev
    if batch % n_dev:
        batch += n_dev - batch % n_dev
    frames = sorted(
        os.path.join(frame_dir, f) for f in os.listdir(frame_dir)
        if f.lower().endswith((".png", ".pgm", ".ppm", ".jpg", ".jpeg")))
    if len(frames) < 2:
        raise ValueError(f"{frame_dir}: need at least 2 frames")
    os.makedirs(out_dir, exist_ok=True)

    first = _decode_batch(frames[:1], noc)
    h_org, w_org = first.shape[2], first.shape[3]
    params = op_point_params(w_org, op_point, nop=nop, noc=noc, verbosity=0)
    top, bot, left, right = pad_amounts(w_org, h_org, params.sc_f)
    full_h, full_w = h_org + top + bot, w_org + left + right

    if streams:
        return _run_pipeline_streams(
            frames, out_dir, params=params, streams=streams, mesh=mesh,
            noc=noc, nop=nop, h_org=h_org, w_org=w_org, top=top, left=left,
            full_h=full_h, full_w=full_w, verbose=verbose)

    pairs = list(zip(frames[:-1], frames[1:]))
    batches: List[List] = [pairs[i:i + batch]
                           for i in range(0, len(pairs), batch)]

    # one jitted step: divisibility-pad + full pipeline. Padding inside the
    # jit keeps it sharded on the mesh path (each chip pads its own shard).
    def _step(a, b):
        a = jax.vmap(lambda x: pyramid.pad_to_divisible(x, params.sc_f))(a)
        b = jax.vmap(lambda x: pyramid.pad_to_divisible(x, params.sc_f))(b)
        return dis.dis_flow_batched(a, b, params, full_w, full_h,
                                    channels_last=False)

    if mesh is None:
        fn = jax.jit(_step)
        put = jnp.asarray
    else:
        axis = tuple(mesh.shape.keys())[0]
        sh = NamedSharding(mesh, P(axis))
        fn = jax.jit(_step, in_shardings=(sh, sh), out_shardings=sh)
        put = lambda x: jax.device_put(x, sh)

    def host_decode(pair_batch):
        # ship u8 to the device: 4x less transfer, and the pyramid's u8
        # ingestion path is bit-identical to f32 while skipping the `lo`
        # bf16 correction dot (its full-res stream dominated op-2 HBM
        # traffic). 8-bit sources make the u8 cast lossless (the gray
        # conversion is fixed-point, io_native.cpp::to_chw)
        a = _decode_batch([p[0] for p in pair_batch], noc)
        b = _decode_batch([p[1] for p in pair_batch], noc)
        return a, b

    # prefetch thread: decode batch k+1 while the device runs batch k
    q: Queue = Queue(maxsize=2)

    def producer():
        # a decode failure must reach the consumer, not kill this thread
        # silently (which would hang the main loop on q.get forever); the
        # error rides the queue as a sentinel and re-raises at the consumer
        try:
            for pb in batches:
                q.put((pb, host_decode(pb)))
            q.put(None)
        except BaseException as e:  # noqa: BLE001
            q.put(_ProducerError(e))

    threading.Thread(target=producer, daemon=True).start()

    writer = ThreadPoolExecutor(max_workers=4)
    n_done = 0
    t0 = time.perf_counter()
    pending = []  # (pair_batch, device_output) in flight
    ext = ".pfm" if nop == 1 else ".flo"

    def drain(item):
        nonlocal n_done
        pair_batch, out = item
        # (B, nop, H, W) planar device layout; repack per pair on the host
        flows = np.moveaxis(np.asarray(out), 1, 3)  # forces device completion
        for k, (f1, _) in enumerate(pair_batch):
            fl = flows[k, top:top + h_org, left:left + w_org]
            name = os.path.splitext(os.path.basename(f1))[0] + ext
            write = uio.write_pfm if nop == 1 else uio.write_flo
            writer.submit(write, os.path.join(out_dir, name), fl)
        n_done += len(pair_batch)

    while True:
        item = q.get()
        if item is None:
            break
        if isinstance(item, _ProducerError):
            writer.shutdown(wait=True)
            raise RuntimeError(
                f"frame decode failed in {frame_dir}") from item.exc
        pair_batch, (a_np, b_np) = item
        nb = len(pair_batch)
        if nb < batch:  # ragged tail: pad to the compiled batch size
            repa = np.repeat(a_np[-1:], batch - nb, axis=0)
            a_np = np.concatenate([a_np, repa])
            b_np = np.concatenate([b_np, np.repeat(b_np[-1:], batch - nb,
                                                   axis=0)])
        out = fn(put(a_np), put(b_np))[:nb]
        pending.append((pair_batch, out))
        if len(pending) > 1:     # drain all but the in-flight batch
            drain(pending.pop(0))
    while pending:
        drain(pending.pop(0))
    writer.shutdown(wait=True)
    dt = time.perf_counter() - t0
    if verbose:
        print(f"{n_done} pairs in {dt:.2f}s -> {n_done / dt:.1f} pairs/s")
    return n_done


def _run_pipeline_streams(frames, out_dir, *, params, streams, mesh, noc,
                          nop, h_org, w_org, top, left, full_h, full_w,
                          verbose) -> int:
    """S-lane warm-start sequence serving (run_pipeline streams=S).

    The video's N-1 consecutive pairs split into S contiguous segments;
    device step t runs pair t of every segment as one S-batch through
    dis.dis_step_warm, threading each lane's warm-start carry. Decode of
    step t+1 and writes of step t-1 overlap device compute of step t,
    exactly like the cold-batch path. Exhausted lanes (segments differ by
    at most one pair) recompute their last pair; those outputs are not
    written."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from of_dis_tpu.models import dis
    from of_dis_tpu.ops import pyramid
    from of_dis_tpu.utils import io as uio

    pairs = list(zip(frames[:-1], frames[1:]))
    n = len(pairs)
    s = max(1, min(streams, n))
    if mesh is not None:
        n_dev = int(np.prod(list(mesh.shape.values())))
        if s % n_dev:
            # round the lane count up to the mesh size; surplus lanes
            # (possible when n < n_dev) stay empty and never write
            s += n_dev - s % n_dev
    base, extra = divmod(n, s)
    lens = [base + (1 if i < extra else 0) for i in range(s)]
    starts = np.concatenate([[0], np.cumsum(lens)])
    segs = [pairs[starts[i]:starts[i + 1]] for i in range(s)]
    t_max = max(lens)
    os.makedirs(out_dir, exist_ok=True)

    def _step(a, b, carry):
        a = jax.vmap(lambda x: pyramid.pad_to_divisible(x, params.sc_f))(a)
        b = jax.vmap(lambda x: pyramid.pad_to_divisible(x, params.sc_f))(b)
        full, nxt = dis.dis_step_warm.__wrapped__(a, b, params, full_w,
                                                  full_h, carry)
        return jnp.moveaxis(full, 3, 1), nxt   # planar (S, nop, H, W)

    if mesh is None:
        fn = jax.jit(_step)
        put = jnp.asarray
    else:
        axis = tuple(mesh.shape.keys())[0]
        sh = NamedSharding(mesh, P(axis))
        fn = jax.jit(_step, in_shardings=(sh, sh, sh),
                     out_shardings=(sh, sh))
        put = lambda x: jax.device_put(x, sh)

    def host_decode(t):
        # lane i's pair at time t (its last pair when exhausted; pair 0
        # for lanes that were empty from the start — never written)
        sel = [segs[i][min(t, lens[i] - 1)] if lens[i] else pairs[0]
               for i in range(s)]
        a = _decode_batch([p[0] for p in sel], noc)
        b = _decode_batch([p[1] for p in sel], noc)
        live = [t < lens[i] for i in range(s)]
        return sel, a, b, live

    q: Queue = Queue(maxsize=2)

    def producer():
        try:
            for t in range(t_max):
                q.put(host_decode(t))
            q.put(None)
        except BaseException as e:  # noqa: BLE001
            q.put(_ProducerError(e))

    threading.Thread(target=producer, daemon=True).start()

    writer = ThreadPoolExecutor(max_workers=4)
    n_done = 0
    t0 = time.perf_counter()
    pending = []
    ext = ".pfm" if nop == 1 else ".flo"

    def drain(item):
        nonlocal n_done
        sel, live, out = item
        flows = np.moveaxis(np.asarray(out), 1, 3)
        for i, (f1, _) in enumerate(sel):
            if not live[i]:
                continue
            fl = flows[i, top:top + h_org, left:left + w_org]
            name = os.path.splitext(os.path.basename(f1))[0] + ext
            write = uio.write_pfm if nop == 1 else uio.write_flo
            writer.submit(write, os.path.join(out_dir, name), fl)
            n_done += 1

    carry = put(np.asarray(dis.warm_carry_init(s, params, full_w, full_h)))
    while True:
        item = q.get()
        if item is None:
            break
        if isinstance(item, _ProducerError):
            writer.shutdown(wait=True)
            raise RuntimeError("frame decode failed") from item.exc
        sel, a_np, b_np, live = item
        out, carry = fn(put(a_np), put(b_np), carry)
        pending.append((sel, live, out))
        if len(pending) > 1:
            drain(pending.pop(0))
    while pending:
        drain(pending.pop(0))
    writer.shutdown(wait=True)
    dt = time.perf_counter() - t0
    if verbose:
        print(f"{n_done} pairs in {dt:.2f}s -> {n_done / dt:.1f} pairs/s "
              f"({s} warm-start streams)")
    return n_done


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    kw = {}
    if "--op" in argv:
        k = argv.index("--op")
        kw["op_point"] = int(argv[k + 1])
        del argv[k:k + 2]
    if "--batch" in argv:
        k = argv.index("--batch")
        kw["batch"] = int(argv[k + 1])
        del argv[k:k + 2]
    if "--mode" in argv:
        k = argv.index("--mode")
        kw["mode"] = argv[k + 1]
        del argv[k:k + 2]
    if "--streams" in argv:
        k = argv.index("--streams")
        kw["streams"] = int(argv[k + 1])
        del argv[k:k + 2]
    if "--mesh" in argv:
        k = argv.index("--mesh")
        spec = argv[k + 1]
        del argv[k:k + 2]
        import jax

        from of_dis_tpu.parallel import mesh as pmesh
        devs = jax.devices()
        if spec != "all":
            devs = devs[:int(spec)]
        kw["mesh"] = pmesh.make_mesh(devs)
    frame_dir, out_dir = argv[:2]
    run_pipeline(frame_dir, out_dir, **kw)
    return 0


if __name__ == "__main__":
    sys.exit(main())
