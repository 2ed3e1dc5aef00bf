"""Edge-partitioned distributed graph kernels under shard_map.

Design (BASELINE.md north star; scaling-book recipe):
  * the edge list is partitioned across the mesh's 'e' axis — each device
    owns an equal static-shaped shard of (dst, src, w) triples (sorted by
    dst within the shard so the local reduce is sorted);
  * dense node vectors (frontier, rank, distance) are REPLICATED: each
    device reduces its shard's contributions into a full-length partial and
    one `psum` over ICI merges them — the algebraic form of the reference's
    OpenMP fan-in, lifted to chips;
  * for >1-host scale the node dimension additionally shards over a second
    mesh axis ('v'), turning the psum into reduce_scatter + all_gather;
    round-1 ships the replicated-vector 1D variant (ICI-efficient to ~16
    chips for RMAT-class graphs) with the mesh plumbing already 2D-ready.

Every step is a pure jitted function: one gather, one elementwise multiply,
one sorted segment-reduce, one psum."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def make_mesh(devices=None, axis="e"):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def shard_edges_1d(src, dst, w, n_devices, sort_by="dst"):
    """Partition an edge list into n_devices equal static shards.

    Edges are sorted by dst and dealt round-robin-contiguously so each
    shard's segment-reduce stays sorted; shards are padded to equal length
    with (-1) sentinels (masked in-kernel)."""
    src = np.asarray(src, dtype=np.int32)
    dst = np.asarray(dst, dtype=np.int32)
    m = len(src)
    order = np.argsort(dst if sort_by == "dst" else src, kind="stable")
    src, dst = src[order], dst[order]
    if w is not None:
        w = np.asarray(w, dtype=np.float32)[order]
    per = -(-m // n_devices)
    cap = per * n_devices
    ps = np.full(cap, 0, dtype=np.int32)
    # pad with the max dst so the tail shard stays sorted for the
    # indices_are_sorted segment reduces (masked to the identity anyway)
    pad_dst = int(dst[-1]) if m and sort_by == "dst" else 0
    pd = np.full(cap, pad_dst, dtype=np.int32)
    pv = np.ones(cap, dtype=np.float32)
    mask = np.zeros(cap, dtype=np.int32)
    ps[:m] = src
    pd[:m] = dst
    mask[:m] = 1
    if w is not None:
        pv[:m] = w
    return (ps.reshape(n_devices, per), pd.reshape(n_devices, per),
            pv.reshape(n_devices, per), mask.reshape(n_devices, per))


# ---------------------------------------------------------------- kernels


def _local_reduce_or(src, dst, mask, x, n):
    g = jnp.take(x, src, mode="clip")
    g = jnp.where(mask > 0, g, 0)
    part = jax.ops.segment_max(g, dst, num_segments=n,
                               indices_are_sorted=True)
    return jnp.maximum(part, 0)


def _local_reduce_sum(src, dst, w, mask, x, n):
    g = jnp.take(x, src, mode="clip") * w
    g = jnp.where(mask > 0, g, 0.0)
    return jax.ops.segment_sum(g, dst, num_segments=n,
                               indices_are_sorted=True)


def dist_bfs_level(mesh, n):
    """Returns a jitted one-level BFS step over the mesh: frontier (n,)
    replicated, edges sharded on axis 'e'."""
    axis = mesh.axis_names[0]

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis, None), P(axis, None), P(axis, None), P(), P()),
             out_specs=(P(), P()))
    def step(srcs, dsts, masks, frontier, levels):
        part = _local_reduce_or(srcs[0], dsts[0], masks[0], frontier, n)
        reach = jax.lax.psum(part, axis)
        fresh = jnp.where(levels < 0, (reach > 0).astype(jnp.int32), 0)
        return fresh, fresh

    return jax.jit(step)


def dist_pagerank_step(mesh, n, damping=0.85):
    """One PageRank iteration over the mesh (rank replicated, edges
    sharded).  inv_out must be precomputed per node (1/outdeg)."""
    axis = mesh.axis_names[0]

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis, None), P(axis, None), P(axis, None),
                       P(axis, None), P(), P(), P()),
             out_specs=P())
    def step(srcs, dsts, ws, masks, rank, inv_out, dangling_mask):
        contrib = rank * inv_out
        part = _local_reduce_sum(srcs[0], dsts[0], ws[0], masks[0], contrib, n)
        acc = jax.lax.psum(part, axis)
        dangling = jnp.sum(rank * dangling_mask) / n
        return ((1.0 - damping) / n + damping * (acc + dangling)).astype(
            jnp.float32)

    return jax.jit(step)


# ------------------------------------------------------- 2D edge partition
#
# The multi-host layout (BASELINE.md north star): device (i,j) of an
# (R x C) mesh owns edges with dst in block i, src in block j.  The
# frontier is sharded over 'c' (each column holds its src block, replicated
# down rows); a level is: local gather+reduce into the dst block, psum
# along 'c' (row all-reduce over ICI), leaving reach sharded over 'r'.
# The r->c re-shard between levels is the classic 2D-SpMV vector transpose
# (XLA lowers it to an all-to-all).  Per-level collective volume is
# O(n/R + n/C) per device instead of O(n) for the 1D layout.


def make_mesh_2d(devices=None, rows=None, axes=("r", "c")):
    devices = list(devices if devices is not None else jax.devices())
    nd = len(devices)
    if rows is None:
        rows = int(np.sqrt(nd))
        while nd % rows:
            rows -= 1
    return Mesh(np.array(devices).reshape(rows, nd // rows), axes)


def shard_edges_2d(src, dst, n, mesh):
    """Partition edges onto the (R x C) mesh with pre-localized indices.

    Node blocks of size `chunk` are laid out b = 0..R*C-1; block b lives on
    device (b // C, b % C).  Device (i,j) owns edges whose src block sits in
    column j (b_src % C == j) and dst block sits in row i (b_dst // C == i):
      * src_local indexes the row-'r' all-gather of column j's frontier
        blocks: (b_src // C) * chunk + src % chunk
      * dst_local indexes row i's contiguous dst range [i*C*chunk, ...):
        dst - i*C*chunk, kept sorted so the local reduce is sorted.
    Returns device_put (src_local, dst_local, mask) of shape (R, C, per)."""
    R, C = mesh.devices.shape
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    chunk = -(-n // (R * C))
    b_src, b_dst = src // chunk, dst // chunk
    dev_j = b_src % C
    dev_i = b_dst // C
    src_local_all = (b_src // C) * chunk + src % chunk
    per = 0
    blocks = {}
    for i in range(R):
        for j in range(C):
            sel = np.nonzero((dev_i == i) & (dev_j == j))[0]
            d_loc = dst[sel] - i * C * chunk
            s_loc = src_local_all[sel]
            order = np.argsort(d_loc, kind="stable")
            blocks[i, j] = (s_loc[order], d_loc[order])
            per = max(per, len(sel), 1)
    ps = np.zeros((R, C, per), dtype=np.int32)
    # pad dst_local with the max segment id so the sorted-reduce invariant
    # holds past the real edges (their masked contribution is the identity)
    pd = np.full((R, C, per), C * chunk - 1, dtype=np.int32)
    mask = np.zeros((R, C, per), dtype=np.int32)
    for (i, j), (s, d) in blocks.items():
        k = len(s)
        ps[i, j, :k] = s
        pd[i, j, :k] = d
        mask[i, j, :k] = 1
    sh = NamedSharding(mesh, P("r", "c", None))
    return (jax.device_put(ps, sh), jax.device_put(pd, sh),
            jax.device_put(mask, sh), chunk)


def dist_bfs_2d(mesh, src_ids, dst_ids, n, source, max_levels=None):
    """BFS over the genuine 2D edge partition: per level each device
    all-gathers its column's frontier blocks along 'r' (volume n/C),
    reduces its edges into the row's dst range, and psums along 'c'
    (volume n/R) — O(n/R + n/C) collective bytes/device instead of the 1D
    layout's O(n).  Frontier/levels stay block-sharded over ('r','c')
    across levels (no re-shard between iterations)."""
    R, C = mesh.devices.shape
    ps, pd, mask, chunk = shard_edges_2d(src_ids, dst_ids, n, mesh)
    ncap = chunk * R * C

    @partial(shard_map, mesh=mesh,
             in_specs=(P("r", "c", None), P("r", "c", None),
                       P("r", "c", None), P(("r", "c")), P(("r", "c"))),
             out_specs=(P(("r", "c")), P(("r", "c"))))
    def step(srcs, dsts, masks, frontier, levels):
        j = jax.lax.axis_index("c")
        # column j's frontier blocks, stacked in row order: (R*chunk,)
        col_frontier = jax.lax.all_gather(frontier, "r", tiled=True)
        g = jnp.take(col_frontier, srcs[0, 0], mode="clip")
        g = jnp.where(masks[0, 0] > 0, g, 0)
        part = jax.ops.segment_max(g, dsts[0, 0], num_segments=C * chunk,
                                   indices_are_sorted=True)
        part = jnp.maximum(part, 0)
        row_reach = jax.lax.psum(part, "c")  # row i's full dst range
        my = jax.lax.dynamic_slice(row_reach, (j * chunk,), (chunk,))
        fresh = jnp.where(levels < 0, (my > 0).astype(jnp.int32), 0)
        return fresh, fresh

    step = jax.jit(step)
    sh = NamedSharding(mesh, P(("r", "c")))
    levels = np.full(ncap, -2, dtype=np.int32)
    levels[:n] = -1
    levels[source] = 0
    frontier = np.zeros(ncap, dtype=np.int32)
    frontier[source] = 1
    levels_d = jax.device_put(levels, sh)
    frontier_d = jax.device_put(frontier, sh)
    depth = 0
    while True:
        fresh, _ = step(ps, pd, mask, frontier_d, levels_d)
        depth += 1
        nnew = int(jnp.sum(fresh))
        if nnew == 0 or (max_levels and depth >= max_levels):
            break
        levels_d = jnp.where(fresh > 0, depth, levels_d)
        frontier_d = fresh
    return np.asarray(levels_d)[:n]


# ------------------------------------------------------------ full drivers


def dist_bfs(mesh, src_ids, dst_ids, w, n, source, max_levels=None):
    """Full distributed BFS; host-driven level loop (each level is one
    jitted shard_map step + psum)."""
    nd = mesh.devices.size
    ps, pd, pv, mask = shard_edges_1d(src_ids, dst_ids, w, nd)
    axis = mesh.axis_names[0]
    sharding = NamedSharding(mesh, P(axis, None))
    ps = jax.device_put(ps, sharding)
    pd = jax.device_put(pd, sharding)
    mask = jax.device_put(mask, sharding)
    step = dist_bfs_level(mesh, n)
    rep = NamedSharding(mesh, P())
    levels = jax.device_put(
        np.where(np.arange(n) == source, 0, -1).astype(np.int32), rep)
    frontier = jax.device_put(
        (np.arange(n) == source).astype(np.int32), rep)
    depth = 0
    while True:
        fresh, _ = step(ps, pd, mask, frontier, levels)
        depth += 1
        nnew = int(jnp.sum(fresh))
        if nnew == 0 or (max_levels and depth >= max_levels):
            break
        levels = jnp.where(fresh > 0, depth, levels)
        frontier = fresh
    return levels


def dist_sssp_step(mesh, n):
    """One min-plus SSSP relaxation over the mesh: dist (n,) replicated,
    weighted edges sharded on 'e'; cross-device merge is a pmin (the
    min-plus semiring's additive collective)."""
    axis = mesh.axis_names[0]
    INF = jnp.float32(np.inf)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis, None), P(axis, None), P(axis, None),
                       P(axis, None), P()),
             out_specs=P())
    def step(srcs, dsts, ws, masks, dist):
        g = jnp.take(dist, srcs[0], mode="clip") + ws[0]
        g = jnp.where(masks[0] > 0, g, INF)
        part = jax.ops.segment_min(g, dsts[0], num_segments=n,
                                   indices_are_sorted=True)
        best = jax.lax.pmin(part, axis)
        return jnp.minimum(dist, best)

    return jax.jit(step)


def dist_sssp(mesh, src_ids, dst_ids, w, n, source, max_iters=None):
    """Distributed Bellman-Ford-style SSSP (algebraic min-plus iterations);
    converges in <=diameter rounds, host checks the fixpoint."""
    nd = mesh.devices.size
    ps, pd, pv, mask = shard_edges_1d(src_ids, dst_ids, w, nd)
    axis = mesh.axis_names[0]
    sharding = NamedSharding(mesh, P(axis, None))
    ps, pd = jax.device_put(ps, sharding), jax.device_put(pd, sharding)
    pv, mask = jax.device_put(pv, sharding), jax.device_put(mask, sharding)
    rep = NamedSharding(mesh, P())
    dist = np.full(n, np.inf, dtype=np.float32)
    dist[source] = 0.0
    dist = jax.device_put(dist, rep)
    step = dist_sssp_step(mesh, n)
    it = 0
    while True:
        new = step(ps, pd, pv, mask, dist)
        it += 1
        changed = bool(jnp.any(new < dist))
        dist = new
        if not changed or (max_iters and it >= max_iters):
            return dist


def dist_wcc(mesh, src_ids, dst_ids, n, max_iters=None):
    """Distributed weakly-connected components: min-label propagation over
    the symmetrized edge list (LAGr_ConnectedComponents role)."""
    s = np.concatenate([np.asarray(src_ids), np.asarray(dst_ids)])
    d = np.concatenate([np.asarray(dst_ids), np.asarray(src_ids)])
    nd = mesh.devices.size
    ps, pd, _, mask = shard_edges_1d(s, d, None, nd)
    axis = mesh.axis_names[0]
    sharding = NamedSharding(mesh, P(axis, None))
    ps, pd = jax.device_put(ps, sharding), jax.device_put(pd, sharding)
    mask = jax.device_put(mask, sharding)
    BIG = jnp.int32(2**30)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis, None), P(axis, None), P(axis, None), P()),
             out_specs=P())
    def step(srcs, dsts, masks, labels):
        g = jnp.take(labels, srcs[0], mode="clip")
        g = jnp.where(masks[0] > 0, g, BIG)
        part = jax.ops.segment_min(g, dsts[0], num_segments=n,
                                   indices_are_sorted=True)
        best = jax.lax.pmin(part, axis)
        return jnp.minimum(labels, best)

    step = jax.jit(step)
    rep = NamedSharding(mesh, P())
    labels = jax.device_put(np.arange(n, dtype=np.int32), rep)
    it = 0
    while True:
        new = step(ps, pd, mask, labels)
        it += 1
        changed = bool(jnp.any(new < labels))
        labels = new
        if not changed or (max_iters and it >= max_iters):
            return labels


def dist_pagerank(mesh, src_ids, dst_ids, n, iters=100, damping=0.85,
                  tol=1e-4):
    nd = mesh.devices.size
    ps, pd, pv, mask = shard_edges_1d(src_ids, dst_ids, None, nd)
    axis = mesh.axis_names[0]
    sharding = NamedSharding(mesh, P(axis, None))
    ps = jax.device_put(ps, sharding)
    pd = jax.device_put(pd, sharding)
    pv = jax.device_put(pv, sharding)
    mask = jax.device_put(mask, sharding)
    outdeg = np.bincount(np.asarray(src_ids, dtype=np.int64), minlength=n)
    inv_out = np.where(outdeg > 0, 1.0 / np.maximum(outdeg, 1), 0.0).astype(
        np.float32)
    dangling = (outdeg == 0).astype(np.float32)
    rep = NamedSharding(mesh, P())
    r = jax.device_put(np.full(n, 1.0 / n, dtype=np.float32), rep)
    inv_out = jax.device_put(inv_out, rep)
    dangling = jax.device_put(dangling, rep)
    step = dist_pagerank_step(mesh, n, damping)
    for _ in range(iters):
        new = step(ps, pd, pv, mask, r, inv_out, dangling)
        # Lockstep: on the virtual CPU mesh (more devices than cores) letting
        # dispatches queue up skews the per-device streams and the in-process
        # all-reduce rendezvous times out (rendezvous.cc).  One sync per
        # iteration keeps exactly one collective in flight; on real ICI
        # hardware collectives are hardware-sequenced and this is removable.
        jax.block_until_ready(new)
        # L1 fixpoint check (same stopping rule as the single-chip kernel)
        done = tol is not None and float(jnp.sum(jnp.abs(new - r))) <= tol
        r = new
        if done:
            break
    return r
