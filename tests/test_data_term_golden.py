"""RGB data terms vs raw dumps of the reference's compute_data /
compute_data_DE C functions (opticalflow_aux.c RGB paths, including the
upstream quirks: channel-1 iy mixup at :496 and the gradient-term robust
weight overwritten by channel 3 at :529/:538).

Goldens were produced by a C harness compiled against /root/reference's
FDF1.0.1 sources (SELECTCHANNEL=3, USE_SSE) on an LCG-generated input set;
tests/goldens/data_term_inputs.bin holds (mask, du, dv, then 8 derivative
images x 3 channels), each a 16x24 float32 plane, in that order.
"""

import os

import numpy as np

import jax.numpy as jnp

from of_dis_tpu.ops import tv

G = os.path.join(os.path.dirname(__file__), "goldens")
W, H = 24, 16
N = W * H


def _load():
    raw = np.fromfile(os.path.join(G, "data_term_inputs.bin"), np.float32)
    mask = raw[:N].reshape(H, W)
    du = raw[N:2 * N].reshape(H, W)
    dv = raw[2 * N:3 * N].reshape(H, W)
    fields = []
    off = 3 * N
    for _ in range(8):
        fields.append(np.stack(
            [raw[off + c * N: off + (c + 1) * N].reshape(H, W)
             for c in range(3)]))
        off += 3 * N
    return mask, du, dv, fields


HD3 = 5.0 * 0.5 / 3.0
HG3 = 10.0 * 0.5 / 3.0


def test_compute_data_rgb_matches_reference_dump():
    mask, du, dv, I = _load()
    ours = tv.compute_data_rgb(jnp.asarray(mask), jnp.asarray(du),
                               jnp.asarray(dv),
                               [jnp.asarray(c) for c in I], HD3, HG3)
    ref = np.fromfile(os.path.join(G, "data_term_rgb.bin"),
                      np.float32).reshape(5, H, W)
    for o, r in zip(ours, ref):
        scale = np.abs(r).max()
        np.testing.assert_allclose(np.asarray(o), r, atol=1e-5 * scale)


def test_compute_data_de_rgb_matches_reference_dump():
    mask, du, _, I = _load()
    ours = tv.compute_data_de_rgb(jnp.asarray(mask), jnp.asarray(du),
                                  [jnp.asarray(c) for c in I], HD3, HG3)
    ref = np.fromfile(os.path.join(G, "data_term_de_rgb.bin"),
                      np.float32).reshape(2, H, W)
    for o, r in zip(ours, ref):
        scale = np.abs(r).max()
        np.testing.assert_allclose(np.asarray(o), r, atol=1e-5 * scale)
