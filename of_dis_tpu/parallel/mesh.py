"""Multi-chip scaling via jax.sharding over a device mesh.

The reference is a single-process CPU program (SURVEY.md §2: no distributed
backend); its only parallelism is OpenMP over patches. The TPU-native scaling
story is therefore data parallelism over the *frame-pair batch axis*: shard
(B, C, H, W) inputs over the mesh's 'batch' axis and let each chip run the
full per-pair pipeline locally — zero collectives on the hot path, ICI only
for input/output redistribution. This is the "batched multi-pair throughput
mode" of BASELINE.md config 5.

For frames too large for one chip's HBM/VMEM, `spatial` sharding splits the
TV refinement's dense fields row-wise with halo exchange (see
of_dis_tpu.parallel.spatial).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from of_dis_tpu.models import dis
from of_dis_tpu.params import DISParams


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "batch"
              ) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(mesh: Mesh, *arrays, axis_name: str = "batch"):
    """Place arrays with their leading (batch) axis sharded over the mesh."""
    sh = NamedSharding(mesh, P(axis_name))
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def dis_flow_sharded(mesh: Mesh, im_a, im_b, params: DISParams,
                     full_w: int, full_h: int, axis_name: str = "batch"):
    """Batched DIS flow with the frame-pair axis sharded over the mesh.

    im_a/im_b: (B, C, H, W) with B divisible by the mesh size. Returns
    (B, H, W, nop) full-resolution flow, sharded the same way.
    """
    sh = NamedSharding(mesh, P(axis_name))
    fn = jax.jit(
        partial(dis.dis_flow_batched, params=params, full_w=full_w,
                full_h=full_h),
        in_shardings=(sh, sh),
        out_shardings=sh,
    )
    return fn(im_a, im_b)


def dis_sequence_sharded(mesh: Mesh, frames, params: DISParams,
                         full_w: int, full_h: int,
                         axis_name: str = "batch"):
    """Warm-start sequence mode with the STREAM axis sharded over the mesh:
    frames (T, S, C, H, W) with S divisible by the mesh size; each chip
    advances its local streams through the scan, warm-start carries stay
    chip-local (zero hot-path collectives, like the batch path). Returns
    (T-1, S, H, W, nop) sharded on S."""
    sh_in = NamedSharding(mesh, P(None, axis_name))
    fn = jax.jit(
        lambda f: dis.dis_sequence_batched(f, params, full_w, full_h),
        in_shardings=sh_in,
        out_shardings=sh_in,
    )
    return fn(frames)
