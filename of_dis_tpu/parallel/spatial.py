"""Spatial (row) sharding of TV refinement with ICI halo exchange.

The reference is single-process and its largest working set is one frame
(SURVEY.md §5: arbitrary sizes handled by padding); on TPU, frames whose TV
working set exceeds one chip's memory shard ROW-wise over the mesh and
exchange halos over ICI. This is the long-sequence/context-parallel analogue
for this workload (SURVEY.md §2 parallelism table).

Method: ghost zones. One inner iteration of the TV fixed-point loop has a
bounded vertical dependency reach (derivative stencils, the sub-laplacian
flux, and 2*n_solver red-black neighbor sums), so each shard:

  1. receives a D-row halo of the flow from its neighbors (one
     jax.lax.ppermute pair — the only communication),
  2. runs the STOCK inner loop (of_dis_tpu.ops.tv) on its padded block,
  3. crops the interior, which is exact: boundary-condition errors at the
     padded edges propagate at most `reach` rows per iteration and D is
     sized so they never reach the interior.

Global edge semantics are preserved by (a) filling out-of-image halo rows
with replicated edge rows (which reproduces the clamped 5-tap/3-tap
derivative borders exactly), (b) computing the warp with global row
coordinates, and (c) zeroing the vertical smoothness coupling at the true
global last row (the reference's boundary handling flows entirely through
the zeroed weights, solver.c:42-64).

Reference: refine_variational.cpp:152-247 (the computation being sharded).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from of_dis_tpu.ops import tv


def halo_depth(n_inner: int, n_solver: int) -> int:
    """Vertical dependency depth of derivatives + n_inner fixed-point
    iterations: 4 rows for the warp/derivative stencil chain, then per inner
    iteration 1 (smoothness d3) + 1 (sub-laplacian flux) + 2*n_solver
    (red-black neighbor sums)."""
    return 4 + n_inner * (2 + 2 * n_solver)


def _exchange_flow_halo(*fields, d, axis_name, n_shards):
    """Pad each local (hL, W) flow block with d rows from each neighbor.

    Missing neighbors (global top/bottom) are filled with replicated edge
    rows, which reproduces the reference's clamped borders for the
    derivative stencils. Returns one (hL + 2d, W) block per field (a
    single block unwrapped) — pass only the fields that exist so the
    depth path pays one halo exchange, not two.
    """
    def pad(x):
        up, down = None, None
        if n_shards > 1:
            # receive the d bottom rows of the shard above / top rows below
            up = jax.lax.ppermute(x[-d:], axis_name,
                                  [(i, i + 1) for i in range(n_shards - 1)])
            down = jax.lax.ppermute(x[:d], axis_name,
                                    [(i, i - 1) for i in range(1, n_shards)])
        idx = jax.lax.axis_index(axis_name)
        top_fill = jnp.broadcast_to(x[:1], (d,) + x.shape[1:])
        bot_fill = jnp.broadcast_to(x[-1:], (d,) + x.shape[1:])
        if n_shards > 1:
            up = jnp.where(idx == 0, top_fill, up)
            down = jnp.where(idx == n_shards - 1, bot_fill, down)
        else:
            up, down = top_fill, bot_fill
        return jnp.concatenate([up, x, down], axis=0)

    out = tuple(pad(f) for f in fields)
    return out[0] if len(out) == 1 else out


def _warp_global(src, wx, wy, gy0, gh):
    """Bilinear warp of the (replicated) full image for local rows whose
    global row coordinates start at gy0 (may be negative in the halo; they
    are clamped, matching the replicated-edge-row fill). src (C,H,W);
    wx/wy (hP, W)."""
    c, h, w = src.shape
    hp = wx.shape[0]
    gy = jnp.clip(gy0 + jnp.arange(hp, dtype=jnp.float32)[:, None],
                  0.0, float(gh - 1))
    gx = jnp.arange(w, dtype=jnp.float32)[None, :]
    xx = gx + wx
    yy = gy + wy
    mask = ((xx >= 0) & (xx <= w - 1) & (yy >= 0) & (yy <= h - 1)
            ).astype(jnp.float32)
    x0 = jnp.floor(xx)
    y0 = jnp.floor(yy)
    dx = xx - x0
    dy = yy - y0
    x1 = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x2 = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    y1 = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y2 = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
    flat = src.reshape(c, h * w)

    def take(iy_, ix_):
        idx = (iy_ * w + ix_).reshape(hp * w)
        return jnp.stack([jnp.take(flat[ch], idx) for ch in range(c)],
                         0).reshape(c, hp, w)

    out = (take(y1, x1) * (1 - dx) * (1 - dy) + take(y1, x2) * dx * (1 - dy)
           + take(y2, x1) * (1 - dx) * dy + take(y2, x2) * dx * dy)
    return out, mask


def _shard_prologue(flow_fields, im1, im2, *, axis_name, n_shards, gh,
                    n_inner, n_solver):
    """Shared shard-local setup for the OF and DE bodies: halo-exchange the
    flow field(s), de-pad the replicated images to this shard's padded
    rows, warp, build the derivative fields, and the boundary masks.

    flow_fields: (wx,) for depth (wy == 0) or (wx, wy) for flow — the
    depth path pays a single-field halo exchange. Returns (padded flows
    tuple, warp mask, i_fields, _rep, not_last, d, parity) — parity is
    the padded block's global row-origin parity, to be threaded into the
    red-black sweeps so local checkerboard colours coincide with the
    unsharded sweep's at ANY shard height (solver.c:34-78 has no size
    restriction; neither should the sharded route)."""
    hl, _ = flow_fields[0].shape
    d = halo_depth(n_inner, n_solver)   # always even (4 + n_inner*even)
    if n_shards > 1:
        assert d <= hl, (
            f"halo depth {d} exceeds shard height {hl}; use fewer shards")
    padded = _exchange_flow_halo(*flow_fields, d=d, axis_name=axis_name,
                                 n_shards=n_shards)
    if len(flow_fields) == 1:
        padded = (padded,)
    gy0 = jax.lax.axis_index(axis_name) * hl - d
    # d is even, so the parity of the padded block's first global row is
    # idx*hl mod 2 (0 for even shard heights; alternating for odd ones)
    parity = (jax.lax.axis_index(axis_name) * hl) % 2

    # local de-pad of the replicated images to this shard's padded rows:
    # global rows are clamped into [0, gh) to mirror the replicated halo fill
    rows = jnp.clip(gy0 + jnp.arange(hl + 2 * d), 0, gh - 1)
    im1_loc = jnp.take(im1, rows, axis=1)

    wyp = padded[1] if len(padded) == 2 else jnp.zeros_like(padded[0])
    w_im2, mask = _warp_global(im2, padded[0], wyp, gy0, gh)

    # Out-of-image halo rows must stay replicas of the global edge row so
    # that every vertical stencil sees the unsharded clamp semantics — for
    # INTERMEDIATE fields too (the unsharded _d5/_d3 clamp their own input:
    # replicating only the raw inputs breaks cascaded stencils like
    # iyy = d5(iy) because iy's halo is a derivative of replicas, not a
    # replica of iy's edge row).
    grow_v = gy0 + jnp.arange(hl + 2 * d)
    oob_map = jnp.clip(grow_v, 0, gh - 1) - gy0

    def _rep(x):
        return jnp.take(x, oob_map, axis=-2)

    # get_derivatives with the intermediate re-replication: only iy needs it
    # (ix/iz halo rows are replicas already; horizontal ops preserve that)
    tmp = 0.5 * (im1_loc + w_im2)
    iz = w_im2 - im1_loc
    ix = tv._d5(tmp, -1)
    iy = _rep(tv._d5(tmp, -2))
    i_fields = (ix, iy, iz, tv._d5(ix, -1), tv._d5(ix, -2),
                tv._d5(iy, -2), tv._d5(iz, -1), tv._d5(iz, -2))

    # the reference's vertical boundary flows entirely through zeroed
    # smoothness weights: wv[r] couples rows (r, r+1), so it must vanish at
    # the global last row AND at every out-of-image halo row (killing the
    # up-coupling into global row 0 exactly like the zero-fill shift does
    # in the unsharded solver)
    grow = grow_v[:, None]
    not_last = ((grow >= 0) & (grow < gh - 1)).astype(jnp.float32)
    return padded, mask, i_fields, _rep, not_last, d, parity


def _local_ref_level_of(wx, wy, im1, im2, *, axis_name, n_shards, gh,
                        noc, quarter_alpha, hd3, hg3, n_inner, n_solver,
                        omega):
    """Shard-local body: runs inside shard_map. wx/wy (hL, W) local rows;
    im1/im2 (C, H, W) replicated."""
    hl = wx.shape[0]
    (wxp, wyp), mask, i_fields, _rep, not_last, d, parity = _shard_prologue(
        (wx, wy), im1, im2, axis_name=axis_name, n_shards=n_shards, gh=gh,
        n_inner=n_inner, n_solver=n_solver)

    def inner(_, carry):
        du, dv, uu, vv = carry
        # du/dv evolve freely in the out-of-image halo; re-replicate before
        # the d3 stencils so uu/vv keep the clamped-edge semantics
        uu = _rep(uu)
        vv = _rep(vv)
        wh, wv = tv.compute_smoothness(uu, vv, quarter_alpha)
        wv = wv * not_last
        if noc == 1:
            a11, a12, a22, b1, b2 = tv.compute_data_gray(
                mask, du, dv, i_fields, hd3, hg3)
        else:
            a11, a12, a22, b1, b2 = tv.compute_data_rgb(
                mask, du, dv, i_fields, hd3, hg3)
        b1 = tv.sub_laplacian(b1, wxp, wh, wv)
        b2 = tv.sub_laplacian(b2, wyp, wh, wv)
        du, dv = tv.sor_coupled_rb(du, dv, a11, a12, a22, b1, b2, wh, wv,
                                   n_solver, omega, row_parity=parity)
        return du, dv, wxp + du, wyp + dv

    zero = jnp.zeros_like(wxp)
    _, _, uu, vv = jax.lax.fori_loop(0, n_inner, inner,
                                     (zero, zero, wxp, wyp))
    return uu[d:d + hl], vv[d:d + hl]


def _local_ref_level_de(wx, im1, im2, *, axis_name, n_shards, gh, noc,
                        camlr, quarter_alpha, hd3, hg3, n_inner, n_solver,
                        omega):
    """Shard-local depth body (RefLevelDE, refine_variational.cpp:251-342):
    1-D disparity, wy = 0 (the warp has no vertical displacement, but the
    derivative stencils, smoothness coupling and red-black solver still
    reach across rows — the halo machinery is identical to the flow body)."""
    hl = wx.shape[0]
    (wxp,), mask, i_fields, _rep, not_last, d, parity = _shard_prologue(
        (wx,), im1, im2, axis_name=axis_name, n_shards=n_shards, gh=gh,
        n_inner=n_inner, n_solver=n_solver)
    zeros = jnp.zeros_like(wxp)

    def inner(_, carry):
        du, uu = carry
        uu = _rep(uu)
        wh, wv = tv.compute_smoothness(uu, zeros, quarter_alpha)
        wv = wv * not_last
        if noc == 1:
            a11, b1 = tv.compute_data_de_gray(mask, du, i_fields, hd3, hg3)
        else:
            a11, b1 = tv.compute_data_de_rgb(mask, du, i_fields, hd3, hg3)
        b1 = tv.sub_laplacian(b1, wxp, wh, wv)
        du = tv.sor_de_rb(du, a11, b1, wh, wv, n_solver, omega,
                          row_parity=parity)
        uu = wxp + du
        if camlr == 0:
            uu = jnp.minimum(uu, 0.0)
        else:
            uu = jnp.maximum(uu, 0.0)
        return du, uu

    _, uu = jax.lax.fori_loop(0, n_inner, inner, (jnp.zeros_like(wxp), wxp))
    return uu[d:d + hl]


def tv_refine_spatial_de(mesh: Mesh, wx: jnp.ndarray, im1: jnp.ndarray,
                         im2: jnp.ndarray, *, alpha, gamma, delta, n_inner,
                         n_solver, omega, camlr: int,
                         axis_name: str = "rows"):
    """Row-sharded depth TV refinement over `mesh` (1-D, axis `axis_name`).

    wx (H, W) disparity; im1/im2 (C, H, W) replicated. H must divide by the
    mesh size. Returns the refined (H, W) disparity, matching the unsharded
    ops.tv.ref_level_de to float noise."""
    n_shards = mesh.shape[axis_name]
    noc = im1.shape[0]
    gh = im1.shape[1]
    kw = dict(axis_name=axis_name, n_shards=n_shards, gh=gh, noc=noc,
              camlr=camlr, quarter_alpha=0.25 * alpha,
              hd3=delta * 0.5 / 3.0, hg3=gamma * 0.5 / 3.0,
              n_inner=n_inner, n_solver=n_solver, omega=omega)

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    fn = shard_map(
        partial(_local_ref_level_de, **kw),
        mesh=mesh,
        in_specs=(P(axis_name, None), P(None, None, None),
                  P(None, None, None)),
        out_specs=P(axis_name, None),
    )
    return fn(wx, im1, im2)


def tv_refine_spatial(mesh: Mesh, flow: jnp.ndarray, im1: jnp.ndarray,
                      im2: jnp.ndarray, *, alpha, gamma, delta, n_inner,
                      n_solver, omega, axis_name: str = "rows"):
    """Row-sharded flow TV refinement over `mesh` (1-D, axis `axis_name`).

    flow (H, W, 2); im1/im2 (C, H, W) replicated on every shard (images are
    small next to the iterated fields; the warp needs global access). H must
    divide by the mesh size. Returns the refined (H, W, 2) flow, matching
    the unsharded ops.tv.ref_level_of to float noise.
    """
    n_shards = mesh.shape[axis_name]
    noc = im1.shape[0]
    gh = im1.shape[1]
    kw = dict(axis_name=axis_name, n_shards=n_shards, gh=gh, noc=noc,
              quarter_alpha=0.25 * alpha, hd3=delta * 0.5 / 3.0,
              hg3=gamma * 0.5 / 3.0, n_inner=n_inner, n_solver=n_solver,
              omega=omega)

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    fn = shard_map(
        partial(_local_ref_level_of, **kw),
        mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name, None), P(None, None, None),
                  P(None, None, None)),
        out_specs=(P(axis_name, None), P(axis_name, None)),
    )
    uu, vv = fn(flow[:, :, 0], flow[:, :, 1], im1, im2)
    return jnp.stack([uu, vv], axis=-1)


def tv_refine_spatial_batched(mesh: Mesh, flow: jnp.ndarray,
                              im1: jnp.ndarray, im2: jnp.ndarray, *,
                              alpha, gamma, delta, n_inner, n_solver,
                              omega, batch_axis: str = "pairs",
                              axis_name: str = "rows"):
    """2-D (pairs x rows) mesh TV refinement: data-parallel over frame
    pairs on `batch_axis` AND row-sharded within each pair on `axis_name`
    — the composition of parallel.mesh's batch sharding with the spatial
    halo-exchange path (both axes ride ICI; the halo ppermutes act only
    along `axis_name`, vmapped over each device's local pairs).

    flow (B, H, W, 2); im1/im2 (B, C, H, W). B must divide by
    mesh.shape[batch_axis] and H by mesh.shape[axis_name]."""
    n_shards = mesh.shape[axis_name]
    noc = im1.shape[1]
    gh = im1.shape[2]
    kw = dict(axis_name=axis_name, n_shards=n_shards, gh=gh, noc=noc,
              quarter_alpha=0.25 * alpha, hd3=delta * 0.5 / 3.0,
              hg3=gamma * 0.5 / 3.0, n_inner=n_inner, n_solver=n_solver,
              omega=omega)

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    def local(fl, i1, i2):
        # fl (B_loc, hL, W, 2); i1/i2 (B_loc, C, H, W)
        def one(f, a, b2):
            uu, vv = _local_ref_level_of(f[..., 0], f[..., 1], a, b2, **kw)
            return jnp.stack([uu, vv], axis=-1)

        return jax.vmap(one)(fl, i1, i2)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(batch_axis, axis_name, None, None),
                  P(batch_axis, None, None, None),
                  P(batch_axis, None, None, None)),
        out_specs=P(batch_axis, axis_name, None, None),
    )
    return fn(flow, im1, im2)
