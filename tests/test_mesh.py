"""Multi-chip frame-pair data parallelism: the mesh-sharded pipeline must
match the unsharded batched pipeline and preserve the batch sharding.

Reference scope: SURVEY.md §2 parallelism table (frame-pair DP row) — the
reference has no distributed backend; the TPU-native scaling story is the
batch axis sharded over a mesh (of_dis_tpu/parallel/mesh.py). Runs on the
8-device virtual CPU mesh from conftest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from of_dis_tpu.models import dis
from of_dis_tpu.parallel import mesh as pmesh
from of_dis_tpu.params import DISParams

H, W = 32, 64


def _pairs(b, noc=1, seed=0):
    rng = np.random.default_rng(seed)
    im_a = jnp.asarray(rng.random((b, noc, H, W)), jnp.float32) * 255
    im_b = jnp.asarray(rng.random((b, noc, H, W)), jnp.float32) * 255
    return im_a, im_b


def _params(**kw):
    base = dict(sc_f=1, sc_l=0, max_iter=6, min_iter=6, p_samp_s=8,
                patove=0.4, noc=1, nop=2, usetvref=True)
    base.update(kw)
    return DISParams(**base)


@pytest.fixture(scope="module")
def mesh8():
    devices = jax.devices()
    assert len(devices) >= 8, "conftest must provide 8 virtual CPU devices"
    return pmesh.make_mesh(devices[:8])


def test_sharded_matches_unsharded(mesh8):
    params = _params()
    im_a, im_b = _pairs(8)
    want = dis.dis_flow_batched(im_a, im_b, params, W, H)
    sa, sb = pmesh.shard_batch(mesh8, im_a, im_b)
    got = pmesh.dis_flow_sharded(mesh8, sa, sb, params, W, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_sharded_output_sharding_preserved(mesh8):
    params = _params()
    im_a, im_b = _pairs(8, seed=1)
    sa, sb = pmesh.shard_batch(mesh8, im_a, im_b)
    # inputs actually land sharded over the batch axis
    want_in = NamedSharding(mesh8, P("batch"))
    assert sa.sharding.is_equivalent_to(want_in, sa.ndim)
    out = pmesh.dis_flow_sharded(mesh8, sa, sb, params, W, H)
    out.block_until_ready()
    assert out.shape == (8, H, W, 2)
    assert out.sharding.is_equivalent_to(
        NamedSharding(mesh8, P("batch")), out.ndim)
    # one shard per device, each carrying exactly one pair
    assert len(out.addressable_shards) == 8
    assert all(s.data.shape[0] == 1 for s in out.addressable_shards)


def test_sharded_batch_multiple_pairs_per_device(mesh8):
    # B=16 over 8 devices: 2 pairs per chip
    params = _params(max_iter=4, min_iter=4)
    im_a, im_b = _pairs(16, seed=2)
    want = dis.dis_flow_batched(im_a, im_b, params, W, H)
    sa, sb = pmesh.shard_batch(mesh8, im_a, im_b)
    got = pmesh.dis_flow_sharded(mesh8, sa, sb, params, W, H)
    assert all(s.data.shape[0] == 2 for s in got.addressable_shards)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_sharded_sequence_streams(mesh8):
    """dis_sequence_batched with the STREAM axis sharded over the mesh
    must match the unsharded sequence mode (warm-start carries stay
    chip-local; reference surface: the init-flow hook oflow.cpp:215-217
    advanced in lockstep over S streams)."""
    params = _params(max_iter=4, min_iter=4)
    rng = np.random.default_rng(5)
    t, s = 3, 8
    frames = jnp.asarray(rng.integers(0, 256, (t, s, 1, H, W)), jnp.uint8)
    want = dis.dis_sequence_batched(frames, params, W, H)
    got = pmesh.dis_sequence_sharded(mesh8, frames, params, W, H)
    assert got.shape == (t - 1, s, H, W, 2)
    assert got.sharding.is_equivalent_to(
        NamedSharding(mesh8, P(None, "batch")), got.ndim)
    # warm-start chaining amplifies sharded-vs-unsharded fusion rounding
    # over T-1 chained solves: a handful of pixels drift a few 1e-3
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-2, atol=1e-2)


def test_sharded_fbcon(mesh8):
    """Forward-backward merge (usefbcon) through the sharded path: the
    fw/bw grid pairing (oflow.cpp:162-169) is part of the surface being
    sharded."""
    params = _params(usefbcon=True, max_iter=4, min_iter=4)
    im_a, im_b = _pairs(8, seed=6)
    want = dis.dis_flow_batched(im_a, im_b, params, W, H)
    sa, sb = pmesh.shard_batch(mesh8, im_a, im_b)
    got = pmesh.dis_flow_sharded(mesh8, sa, sb, params, W, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=2e-3)


def test_sharded_depth_mode(mesh8):
    # nop=1 depth variant through the sharded path
    params = _params(nop=1)
    im_a, im_b = _pairs(8, seed=3)
    want = dis.dis_flow_batched(im_a, im_b, params, W, H)
    sa, sb = pmesh.shard_batch(mesh8, im_a, im_b)
    got = pmesh.dis_flow_sharded(mesh8, sa, sb, params, W, H)
    assert got.shape == (8, H, W, 1)
    # sharded/unsharded compile to different fusions; the iterative GN
    # amplifies the float noise (measured max ~2.5e-4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=2e-3)
