"""Streaming directory->flo pipeline (double-buffered batched serving)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from of_dis_tpu import pipeline
from of_dis_tpu.utils import io as uio


def test_stream_pipeline(tmp_path):
    frame_dir = tmp_path / "frames"
    out_dir = tmp_path / "out"
    frame_dir.mkdir()
    rng = np.random.default_rng(0)
    big = cv2.GaussianBlur((rng.random((140, 180)) * 255).astype(np.float32),
                           (9, 9), 2.5)
    h, w = 96, 128
    n_frames = 5
    for t in range(n_frames):
        m = np.float32([[1, 0, 1.5 * t], [0, 1, 0.5 * t]])
        f = cv2.warpAffine(big, m, (180, 140))[20:20 + h, 20:20 + w]
        cv2.imwrite(str(frame_dir / f"frame_{t:04d}.png"),
                    np.clip(f, 0, 255).astype(np.uint8))

    # batch=2 with 4 pairs exercises the ragged tail path
    n = pipeline.run_pipeline(str(frame_dir), str(out_dir), op_point=1,
                              batch=2, verbose=False)
    assert n == n_frames - 1
    outs = sorted(os.listdir(out_dir))
    assert outs == [f"frame_{t:04d}.flo" for t in range(n_frames - 1)]
    for t in range(n_frames - 1):
        fl = uio.read_flo(str(out_dir / f"frame_{t:04d}.flo"))
        assert fl.shape == (h, w, 2)
        inner = fl[16:-16, 16:-16]
        med = np.median(inner.reshape(-1, 2), axis=0)
        assert abs(med[0] - 1.5) < 0.4 and abs(med[1] - 0.5) < 0.4, (t, med)


def test_pipeline_default_batch_resolution(tmp_path, monkeypatch):
    """batch=0 resolves to the measured per-op-point sweet spot (16 for
    op-3, 8 for op-4, 64 for op-1/2) — asserted by capturing the batch the
    pipeline actually splits with."""
    seen = {}
    orig = pipeline.run_pipeline

    frame_dir = tmp_path / "frames"
    out_dir = tmp_path / "out"
    frame_dir.mkdir()
    rng = np.random.default_rng(2)
    for t in range(3):
        img = (rng.random((64, 96)) * 255).astype(np.uint8)
        cv2.imwrite(str(frame_dir / f"frame_{t:04d}.png"), img)

    import of_dis_tpu.models.dis as dis_mod
    real = dis_mod.dis_flow_batched

    def spy(a, b, *args, **kw):
        seen.setdefault("batches", []).append(int(a.shape[0]))
        return real(a, b, *args, **kw)

    monkeypatch.setattr(dis_mod, "dis_flow_batched", spy)
    pipeline.run_pipeline(str(frame_dir), str(out_dir), op_point=3,
                          batch=0, verbose=False)
    # 2 pairs pad to the resolved batch of 16
    assert seen["batches"] and all(x == 16 for x in seen["batches"])
    del orig


def _write_shift_frames(frame_dir, n_frames, dx, dy, h=96, w=128, seed=0):
    """Frames whose content translates by (dx, dy) px per step."""
    rng = np.random.default_rng(seed)
    big = cv2.GaussianBlur((rng.random((140, 180)) * 255).astype(np.float32),
                           (9, 9), 2.5)
    for t in range(n_frames):
        m = np.float32([[1, 0, dx * t], [0, 1, dy * t]])
        f = cv2.warpAffine(big, m, (180, 140))[20:20 + h, 20:20 + w]
        cv2.imwrite(str(frame_dir / f"frame_{t:04d}.png"),
                    np.clip(f, 0, 255).astype(np.uint8))
    return h, w


def test_stream_pipeline_depth(tmp_path):
    """Depth serving mode (run_DE_INT): consecutive frames as stereo pairs,
    .pfm outputs (run_dense.cpp:421). camlr=0 clamps disparity <= 0, so the
    stream shifts content by -1 px/frame."""
    frame_dir = tmp_path / "frames"
    out_dir = tmp_path / "out"
    frame_dir.mkdir()
    h, w = _write_shift_frames(frame_dir, 4, dx=-1.0, dy=0.0)
    n = pipeline.run_pipeline(str(frame_dir), str(out_dir), op_point=1,
                              batch=2, mode="run_DE_INT", verbose=False)
    assert n == 3
    outs = sorted(os.listdir(out_dir))
    assert outs == [f"frame_{t:04d}.pfm" for t in range(3)]
    for t in range(3):
        d = uio.read_pfm(str(out_dir / f"frame_{t:04d}.pfm"))
        assert d.shape == (h, w)
        med = np.median(d[16:-16, 16:-16])
        assert abs(med - (-1.0)) < 0.4, (t, med)


def test_stream_pipeline_sharded_matches_single(tmp_path):
    """Mesh-sharded streaming == single-device streaming, byte-for-byte:
    the frame-pair axis shards over the 8-device CPU mesh and each device
    runs the identical per-pair program (parallel/mesh.py design)."""
    import jax

    from of_dis_tpu.parallel import mesh as pmesh

    frame_dir = tmp_path / "frames"
    frame_dir.mkdir()
    _write_shift_frames(frame_dir, 6, dx=1.5, dy=0.5)

    out_single = tmp_path / "out_single"
    out_mesh = tmp_path / "out_mesh"
    mesh = pmesh.make_mesh(jax.devices()[:8])
    n1 = pipeline.run_pipeline(str(frame_dir), str(out_single), op_point=1,
                               batch=8, verbose=False)
    n2 = pipeline.run_pipeline(str(frame_dir), str(out_mesh), op_point=1,
                               batch=8, mesh=mesh, verbose=False)
    assert n1 == n2 == 5
    for f in sorted(os.listdir(out_single)):
        a = uio.read_flo(str(out_single / f))
        b = uio.read_flo(str(out_mesh / f))
        np.testing.assert_array_equal(a, b, err_msg=f)


def test_stream_pipeline_warm_streams(tmp_path):
    """--streams S serving: outputs must equal per-pair warm-start chaining
    (dis_flow_full + warm_start_from_full per contiguous segment) — the
    sequence-serving mode the reference keeps as its dormant init-flow hook
    (run_dense.cpp:356-379)."""
    import jax.numpy as jnp

    from of_dis_tpu.models import dis
    from of_dis_tpu.ops import pyramid
    from of_dis_tpu.params import op_point_params, pad_amounts

    frame_dir = tmp_path / "frames"
    out_dir = tmp_path / "out"
    frame_dir.mkdir()
    h, w = _write_shift_frames(frame_dir, 7, dx=1.5, dy=0.5)
    n = pipeline.run_pipeline(str(frame_dir), str(out_dir), op_point=1,
                              streams=2, verbose=False)
    assert n == 6
    outs = sorted(os.listdir(out_dir))
    assert outs == [f"frame_{t:04d}.flo" for t in range(6)]

    # reference: two contiguous 3-pair segments, each a per-pair
    # warm-start chain
    params = op_point_params(w, 1, nop=2, noc=1, verbosity=0)
    top, bot, left, right = pad_amounts(w, h, params.sc_f)
    fh, fw = h + top + bot, w + left + right
    frames = sorted(str(frame_dir / f) for f in os.listdir(frame_dir))
    pairs = list(zip(frames[:-1], frames[1:]))
    segs = [pairs[:3], pairs[3:]]
    for seg in segs:
        carry = dis.warm_carry_init(1, params, fw, fh)[0]
        for f1, f2 in seg:
            a = pyramid.pad_to_divisible(
                jnp.asarray(pipeline._decode_batch([f1], 1)[0]), params.sc_f)
            b = pyramid.pad_to_divisible(
                jnp.asarray(pipeline._decode_batch([f2], 1)[0]), params.sc_f)
            full = dis.dis_flow_full(a, b, params, fw, fh, init_flow=carry)
            carry = dis.warm_start_from_full(full, params.sc_f)
            want = np.asarray(full)[top:top + h, left:left + w]
            name = os.path.splitext(os.path.basename(f1))[0] + ".flo"
            got = uio.read_flo(str(out_dir / name))
            np.testing.assert_allclose(got, want, atol=1e-4, err_msg=name)


def test_stream_pipeline_corrupt_frame(tmp_path):
    """A truncated/corrupt frame must fail the run with a clear error, not
    hang the consumer on a dead producer thread (the producer propagates
    the exception through the queue)."""
    frame_dir = tmp_path / "frames"
    out_dir = tmp_path / "out"
    frame_dir.mkdir()
    rng = np.random.default_rng(1)
    for t in range(3):
        img = (rng.random((64, 96)) * 255).astype(np.uint8)
        cv2.imwrite(str(frame_dir / f"frame_{t:04d}.png"), img)
    # truncate the middle frame to garbage
    p = frame_dir / "frame_0001.png"
    p.write_bytes(p.read_bytes()[:20])

    with pytest.raises(RuntimeError, match="frame decode failed"):
        pipeline.run_pipeline(str(frame_dir), str(out_dir), op_point=1,
                              batch=2, verbose=False)
