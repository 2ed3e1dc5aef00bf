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


def shard_edges_2d(src, dst, n, mesh, w=None, align=1):
    """Partition edges onto the (R x C) mesh with pre-localized indices.

    Node blocks of size `chunk` are laid out b = 0..R*C-1; block b lives on
    device (b // C, b % C).  Device (i,j) owns edges whose src block sits in
    column j (b_src % C == j) and dst block sits in row i (b_dst // C == i):
      * src_local indexes the row-'r' all-gather of column j's frontier
        blocks: (b_src // C) * chunk + src % chunk
      * dst_local indexes row i's contiguous dst range [i*C*chunk, ...):
        dst - i*C*chunk, kept sorted so the local reduce is sorted.
    `align` rounds chunk up (32 for the bit-packed frontier exchange).
    Returns device_put (src_local, dst_local, mask[, w]) of shape
    (R, C, per) plus chunk."""
    R, C = mesh.devices.shape
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    chunk = -(-n // (R * C))
    chunk = -(-chunk // align) * align
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
            wv = None if w is None else np.asarray(w, np.float32)[sel][order]
            blocks[i, j] = (s_loc[order], d_loc[order], wv)
            per = max(per, len(sel), 1)
    ps = np.zeros((R, C, per), dtype=np.int32)
    # pad dst_local with the max segment id so the sorted-reduce invariant
    # holds past the real edges (their masked contribution is the identity)
    pd = np.full((R, C, per), C * chunk - 1, dtype=np.int32)
    mask = np.zeros((R, C, per), dtype=np.int32)
    pw = np.zeros((R, C, per), dtype=np.float32) if w is not None else None
    for (i, j), (s, d, wv) in blocks.items():
        k = len(s)
        ps[i, j, :k] = s
        pd[i, j, :k] = d
        mask[i, j, :k] = 1
        if pw is not None:
            pw[i, j, :k] = wv
    sh = NamedSharding(mesh, P("r", "c", None))
    out = (jax.device_put(ps, sh), jax.device_put(pd, sh),
           jax.device_put(mask, sh))
    if pw is not None:
        out = out + (jax.device_put(pw, sh),)
    return out + (chunk,)


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


# ----------------------------------------------------- fused level loops
#
# The host-driven drivers above pay one dispatch + mesh rendezvous PER
# LEVEL plus a device->host frontier-count fetch; on a virtual CPU mesh
# that fixed cost dominates (measured r4: 95 ms/level end-to-end vs
# 8.7 ms/level for the step kernel alone at 8 devices).  The fused
# variants run the whole iteration loop inside ONE jitted shard_map
# program (lax.while_loop / fori_loop with the collectives inside), so a
# full traversal is a single dispatch.  Convergence flags are replicated
# values (or scalar psums), keeping every device in lockstep by
# construction.  Reference counterpart: the pull-based level loop in
# /root/reference/graph/src/graph/graphblas (BFS via repeated vxm) — here
# the loop itself is compiled.

def dist_bfs_fused(mesh, src_ids, dst_ids, n, source, max_levels=None):
    """1D fused BFS: edges sharded on 'e', frontier/levels replicated,
    entire level loop in one XLA program."""
    nd = mesh.devices.size
    ps, pd, _, mask = shard_edges_1d(src_ids, dst_ids, None, nd)
    axis = mesh.axis_names[0]
    sh = NamedSharding(mesh, P(axis, None))
    ps, pd = jax.device_put(ps, sh), jax.device_put(pd, sh)
    mask = jax.device_put(mask, sh)
    cap = jnp.int32(max_levels if max_levels else n)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis, None), P(axis, None), P(axis, None),
                       P(), P()),
             out_specs=P())
    def run(srcs, dsts, masks, frontier, levels):
        def cond(st):
            f, lv, d = st
            return jnp.logical_and(jnp.any(f > 0), d < cap)

        def body(st):
            f, lv, d = st
            part = _local_reduce_or(srcs[0], dsts[0], masks[0], f, n)
            reach = jax.lax.psum(part, axis)
            fresh = jnp.where(lv < 0, (reach > 0).astype(jnp.int32), 0)
            lv = jnp.where(fresh > 0, d + 1, lv)
            return fresh, lv, d + 1

        _, lv, _ = jax.lax.while_loop(
            cond, body, (frontier, levels, jnp.int32(0)))
        return lv

    run = jax.jit(run)
    rep = NamedSharding(mesh, P())
    levels0 = jax.device_put(
        np.where(np.arange(n) == source, 0, -1).astype(np.int32), rep)
    frontier0 = jax.device_put(
        (np.arange(n) == source).astype(np.int32), rep)
    return run(ps, pd, mask, frontier0, levels0)


def dist_bfs_fused_bitmap(mesh, src_ids, dst_ids, n, source,
                          max_levels=None):
    """1D fused BFS with bit-packed frontier exchange (VERDICT r4 #8).

    The dense int32 psum (≈8n bytes/device/level counting both ring
    phases) becomes the OR-monoid analogue of ring allreduce: pack the
    local partial to n/32 uint32 words, all_to_all word BLOCKS along 'e'
    (the reduce-scatter — OR has no inverse, so the scatter ships raw
    blocks and each device ORs its own), then one tiled all_gather of
    the merged blocks.  Per-device volume ≈ 2·(n/8)·(nd-1)/nd bytes —
    within ~3.5x of the 2D layout's chunk-bitmap exchange and ~32x under
    the dense psum.  Frontier/levels replicated; whole loop is one XLA
    program like dist_bfs_fused."""
    nd = mesh.devices.size
    ncap = -(-n // (32 * nd)) * (32 * nd)
    W = ncap // 32          # packed words, replicated
    blk = W // nd           # per-device word block in the exchange
    ps, pd, _, mask = shard_edges_1d(src_ids, dst_ids, None, nd)
    axis = mesh.axis_names[0]
    sh = NamedSharding(mesh, P(axis, None))
    ps, pd = jax.device_put(ps, sh), jax.device_put(pd, sh)
    mask = jax.device_put(mask, sh)
    cap = jnp.int32(max_levels if max_levels else n)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis, None), P(axis, None), P(axis, None),
                       P(), P()),
             out_specs=P())
    def run(srcs, dsts, masks, fwords, levels):
        def cond(st):
            fw, lv, d = st
            return jnp.logical_and(jnp.any(fw != 0), d < cap)

        def body(st):
            fw, lv, d = st
            f = _unpack_bits(fw)                       # (ncap,) 0/1
            part = _local_reduce_or(srcs[0], dsts[0], masks[0], f, ncap)
            pk = _pack_bits(part).reshape(nd, blk)
            got = jax.lax.all_to_all(pk, axis, split_axis=0,
                                     concat_axis=0)    # (nd, blk) mine
            mine = got[0]
            for k in range(1, nd):
                mine = mine | got[k]
            reach = jax.lax.all_gather(mine, axis, tiled=True)  # (W,)
            visited = _pack_bits((lv >= 0).astype(jnp.int32))
            fresh = reach & ~visited
            lv = jnp.where((_unpack_bits(fresh) > 0) & (lv == -1),
                           d + 1, lv)
            return fresh, lv, d + 1

        # all_to_all/all_gather outputs are marked varying over 'e';
        # align the replicated initial carry with that type
        fw0 = jax.lax.pcast(fwords, (axis,), to="varying")
        lv0 = jax.lax.pcast(levels, (axis,), to="varying")
        _, lv, _ = jax.lax.while_loop(
            cond, body, (fw0, lv0, jnp.int32(0)))
        # lv is identical on every device but typed varying (it flowed
        # through all_to_all); one pmax outside the loop re-proves
        # replication for out_specs=P()
        return jax.lax.pmax(lv, axis)

    run = jax.jit(run)
    rep = NamedSharding(mesh, P())
    levels = np.full(ncap, -1, dtype=np.int32)
    levels[source] = 0
    fb = np.zeros(ncap, dtype=np.uint32)
    fb[source] = 1
    fwords = np.bitwise_or.reduce(
        fb.reshape(-1, 32) << np.arange(32, dtype=np.uint32),
        axis=1).astype(np.uint32)
    out = run(ps, pd, mask, jax.device_put(fwords, rep),
              jax.device_put(levels, rep))
    return np.asarray(out)[:n]


def dist_pagerank_fused(mesh, src_ids, dst_ids, n, iters=20, damping=0.85,
                        no_comm=False):
    """1D fused PageRank: fixed-iteration fori_loop in one program.

    no_comm=True replaces the psum with the local partial (WRONG results;
    used only as the zero-collective timing control for the scaling
    artifact's comm-efficiency measurement)."""
    nd = mesh.devices.size
    ps, pd, pv, mask = shard_edges_1d(src_ids, dst_ids, None, nd)
    axis = mesh.axis_names[0]
    sh = NamedSharding(mesh, P(axis, None))
    ps, pd = jax.device_put(ps, sh), jax.device_put(pd, sh)
    pv, mask = jax.device_put(pv, sh), jax.device_put(mask, sh)
    outdeg = np.bincount(np.asarray(src_ids, dtype=np.int64), minlength=n)
    inv_out = np.where(outdeg > 0, 1.0 / np.maximum(outdeg, 1), 0.0).astype(
        np.float32)
    dangling = (outdeg == 0).astype(np.float32)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis, None), P(axis, None), P(axis, None),
                       P(axis, None), P(), P(), P()),
             out_specs=P())
    def run(srcs, dsts, ws, masks, rank, inv_o, dang):
        def body(_, r):
            contrib = r * inv_o
            part = _local_reduce_sum(srcs[0], dsts[0], ws[0], masks[0],
                                     contrib, n)
            acc = part if no_comm else jax.lax.psum(part, axis)
            d = jnp.sum(r * dang) / n
            return ((1.0 - damping) / n
                    + damping * (acc + d)).astype(jnp.float32)

        if no_comm:
            # The collective-free control leaves the carry device-varying;
            # mark the initial carry to match, and fold the result to a
            # replicated scalar with ONE end-of-run psum so out_specs stays
            # P() (timing-only path; per-iteration collectives elided).
            rank = jax.lax.pvary(rank, (axis,))
            out = jax.lax.fori_loop(0, iters, body, rank)
            return jnp.broadcast_to(
                jax.lax.psum(jnp.sum(out), axis), (n,))
        return jax.lax.fori_loop(0, iters, body, rank)

    run = jax.jit(run)
    rep = NamedSharding(mesh, P())
    r0 = jax.device_put(np.full(n, 1.0 / n, dtype=np.float32), rep)
    return run(ps, pd, pv, mask, r0,
               jax.device_put(inv_out, rep), jax.device_put(dangling, rep))


def dist_sssp_fused(mesh, src_ids, dst_ids, w, n, source, max_iters=None):
    """1D fused min-plus SSSP: Bellman-Ford fixpoint in one program."""
    nd = mesh.devices.size
    ps, pd, pv, mask = shard_edges_1d(src_ids, dst_ids, w, nd)
    axis = mesh.axis_names[0]
    sh = NamedSharding(mesh, P(axis, None))
    ps, pd = jax.device_put(ps, sh), jax.device_put(pd, sh)
    pv, mask = jax.device_put(pv, sh), jax.device_put(mask, sh)
    INF = jnp.float32(np.inf)
    cap = jnp.int32(max_iters if max_iters else n)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis, None), P(axis, None), P(axis, None),
                       P(axis, None), P()),
             out_specs=P())
    def run(srcs, dsts, ws, masks, dist0):
        def cond(st):
            _, changed, it = st
            return jnp.logical_and(changed, it < cap)

        def body(st):
            dist, _, it = st
            g = jnp.take(dist, srcs[0], mode="clip") + ws[0]
            g = jnp.where(masks[0] > 0, g, INF)
            part = jax.ops.segment_min(g, dsts[0], num_segments=n,
                                       indices_are_sorted=True)
            best = jax.lax.pmin(part, axis)
            new = jnp.minimum(dist, best)
            return new, jnp.any(new < dist), it + 1

        out, _, _ = jax.lax.while_loop(
            cond, body, (dist0, jnp.bool_(True), jnp.int32(0)))
        return out

    run = jax.jit(run)
    rep = NamedSharding(mesh, P())
    d0 = np.full(n, np.inf, dtype=np.float32)
    d0[source] = 0.0
    return run(ps, pd, pv, mask, jax.device_put(d0, rep))


def dist_wcc_fused(mesh, src_ids, dst_ids, n, max_iters=None):
    """1D fused WCC: min-label propagation fixpoint in one program."""
    s = np.concatenate([np.asarray(src_ids), np.asarray(dst_ids)])
    d = np.concatenate([np.asarray(dst_ids), np.asarray(src_ids)])
    nd = mesh.devices.size
    ps, pd, _, mask = shard_edges_1d(s, d, None, nd)
    axis = mesh.axis_names[0]
    sh = NamedSharding(mesh, P(axis, None))
    ps, pd = jax.device_put(ps, sh), jax.device_put(pd, sh)
    mask = jax.device_put(mask, sh)
    BIG = jnp.int32(2**30)
    cap = jnp.int32(max_iters if max_iters else n)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis, None), P(axis, None), P(axis, None), P()),
             out_specs=P())
    def run(srcs, dsts, masks, labels0):
        def cond(st):
            _, changed, it = st
            return jnp.logical_and(changed, it < cap)

        def body(st):
            lab, _, it = st
            g = jnp.take(lab, srcs[0], mode="clip")
            g = jnp.where(masks[0] > 0, g, BIG)
            part = jax.ops.segment_min(g, dsts[0], num_segments=n,
                                       indices_are_sorted=True)
            best = jax.lax.pmin(part, axis)
            new = jnp.minimum(lab, best)
            return new, jnp.any(new < lab), it + 1

        out, _, _ = jax.lax.while_loop(
            cond, body, (labels0, jnp.bool_(True), jnp.int32(0)))
        return out

    run = jax.jit(run)
    rep = NamedSharding(mesh, P())
    return run(ps, pd, mask,
               jax.device_put(np.arange(n, dtype=np.int32), rep))


# ------------------------------------------- bit-packed frontier helpers

def _pack_bits(bits):
    """(..., k*32) 0/1 int -> (..., k) uint32, little-endian within words.
    Distinct powers of two, so the uint32 sum IS the bitwise OR."""
    b = bits.astype(jnp.uint32).reshape(bits.shape[:-1] + (-1, 32))
    return jnp.sum(b << jnp.arange(32, dtype=jnp.uint32), axis=-1,
                   dtype=jnp.uint32)


def _unpack_bits(words):
    """(..., k) uint32 -> (..., k*32) int32 0/1."""
    b = (words[..., None] >> jnp.arange(32, dtype=jnp.uint32)) & 1
    return b.astype(jnp.int32).reshape(words.shape[:-1] + (-1,))


# ------------------------------------- 2D fused kernels (bitmap exchange)
#
# Per-device collective volume per iteration (chunk = n/(R*C) nodes):
#   1D psum over the full vector:  ~2 * 4n * (nd-1)/nd bytes
#   2D BFS (bitmap):  all_gather 'r' of chunk/8-byte bitmaps  (R-1)*chunk/8
#                   + all_to_all 'c' of packed partials       (C-1)*chunk/8
#   2D PageRank:      all_gather 'r' of f32 blocks            (R-1)*chunk*4
#                   + psum_scatter 'c' (ring reduce-scatter)  (C-1)*chunk*4
# For n=2^20, nd=8 (R=2,C=4): 1D BFS moves ~7.3 MB/device/level; 2D bitmap
# moves ~64 KB — a ~110x reduction in ICI bytes.


def dist_bfs_2d_bitmap(mesh, src_ids, dst_ids, n, source, max_levels=None):
    """Fused 2D BFS with fully bit-packed frontier exchange.

    Layout: node block b (size chunk, 32-aligned) lives on device
    (b//C, b%C).  One level = all_gather of the column's frontier bitmaps
    along 'r' (chunk/8 bytes x R), local gather + sorted segment-max into
    the row's dst range, pack, all_to_all along 'c' (the OR-reduce-scatter
    of the min-OR semiring), local OR.  The whole level loop runs inside
    one XLA program; global convergence is a scalar psum carried in the
    loop state.  Returns host levels[:n] (np.int32, -1 = unreached)."""
    R, C = mesh.devices.shape
    ps, pd, mask, chunk = shard_edges_2d(src_ids, dst_ids, n, mesh,
                                         align=32)
    ncap = chunk * R * C
    W = chunk // 32
    cap = jnp.int32(max_levels if max_levels else n)

    @partial(shard_map, mesh=mesh,
             in_specs=(P("r", "c", None), P("r", "c", None),
                       P("r", "c", None), P(("r", "c")), P(("r", "c"))),
             out_specs=P(("r", "c")))
    def run(srcs, dsts, masks, fbits0, levels0):
        def cond(st):
            _, _, d, alive = st
            return jnp.logical_and(alive, d < cap)

        def body(st):
            fbits, lv, d, _ = st
            col_words = jax.lax.all_gather(fbits, "r", tiled=True)
            col_frontier = _unpack_bits(col_words)      # (R*chunk,)
            g = jnp.take(col_frontier, srcs[0, 0], mode="clip")
            g = jnp.where(masks[0, 0] > 0, g, 0)
            part = jax.ops.segment_max(g, dsts[0, 0],
                                       num_segments=C * chunk,
                                       indices_are_sorted=True)
            part = jnp.maximum(part, 0)
            pk = _pack_bits(part.reshape(C, chunk))     # (C, W)
            got = jax.lax.all_to_all(pk, "c", split_axis=0, concat_axis=0)
            reach = got[0]
            for k in range(1, C):
                reach = reach | got[k]                  # (W,) my block
            visited = _pack_bits((lv >= 0).astype(jnp.int32))
            fresh = reach & ~visited
            lv = jnp.where((_unpack_bits(fresh) > 0) & (lv == -1),
                           d + 1, lv)
            nfresh = jax.lax.psum(
                jnp.any(fresh != 0).astype(jnp.int32), ("r", "c"))
            return fresh, lv, d + 1, nfresh > 0

        _, lv, _, _ = jax.lax.while_loop(
            cond, body, (fbits0, levels0, jnp.int32(0), jnp.bool_(True)))
        return lv

    run = jax.jit(run)
    sh = NamedSharding(mesh, P(("r", "c")))
    levels = np.full(ncap, -1, dtype=np.int32)
    levels[source] = 0
    fb = np.zeros(ncap, dtype=np.uint32)
    fb[source] = 1
    fbits = np.bitwise_or.reduce(
        fb.reshape(-1, 32).astype(np.uint32)
        << np.arange(32, dtype=np.uint32), axis=1).astype(np.uint32)
    out = run(ps, pd, mask, jax.device_put(fbits, sh),
              jax.device_put(levels, sh))
    return np.asarray(out)[:n]


def dist_pagerank_2d(mesh, src_ids, dst_ids, n, iters=20, damping=0.85):
    """Fused 2D PageRank: rank block-sharded over ('r','c'); per iteration
    one all_gather along 'r' (n/C floats in) and one psum_scatter along
    'c' (ring reduce-scatter, n/R floats) replace the 1D full-vector
    psum.  Returns host rank[:n]."""
    R, C = mesh.devices.shape
    ps, pd, mask, chunk = shard_edges_2d(src_ids, dst_ids, n, mesh)
    ncap = chunk * R * C
    outdeg = np.bincount(np.asarray(src_ids, dtype=np.int64), minlength=n)
    inv_out = np.zeros(ncap, np.float32)
    inv_out[:n] = np.where(outdeg > 0, 1.0 / np.maximum(outdeg, 1), 0.0)
    dangling = np.zeros(ncap, np.float32)
    dangling[:n] = (outdeg == 0)
    valid = np.zeros(ncap, np.float32)
    valid[:n] = 1.0

    @partial(shard_map, mesh=mesh,
             in_specs=(P("r", "c", None), P("r", "c", None),
                       P("r", "c", None), P(("r", "c")), P(("r", "c")),
                       P(("r", "c")), P(("r", "c"))),
             out_specs=P(("r", "c")))
    def run(srcs, dsts, masks, rank0, inv_o, dang, val):
        def body(_, r):
            contrib = r * inv_o                         # (chunk,)
            col = jax.lax.all_gather(contrib, "r", tiled=True)
            g = jnp.take(col, srcs[0, 0], mode="clip")
            g = jnp.where(masks[0, 0] > 0, g, 0.0)
            part = jax.ops.segment_sum(g, dsts[0, 0],
                                       num_segments=C * chunk,
                                       indices_are_sorted=True)
            acc = jax.lax.psum_scatter(part, "c", scatter_dimension=0,
                                       tiled=True)      # (chunk,)
            dtot = jax.lax.psum(jnp.sum(r * dang), ("r", "c"))
            new = (1.0 - damping) / n + damping * (acc + dtot / n)
            return (val * new).astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, rank0)

    run = jax.jit(run)
    sh = NamedSharding(mesh, P(("r", "c")))
    r0 = valid / n
    out = run(ps, pd, mask, jax.device_put(r0, sh),
              jax.device_put(inv_out, sh), jax.device_put(dangling, sh),
              jax.device_put(valid, sh))
    return np.asarray(out)[:n]


def dist_sssp_2d(mesh, src_ids, dst_ids, w, n, source, max_iters=None):
    """Fused 2D min-plus SSSP: dist block-sharded; the 'c'-axis min-reduce-
    scatter is an all_to_all + local min (the min-semiring analogue of
    psum_scatter).  Returns host dist[:n]."""
    R, C = mesh.devices.shape
    ps, pd, mask, pw, chunk = shard_edges_2d(src_ids, dst_ids, n, mesh, w=w)
    ncap = chunk * R * C
    INF = jnp.float32(np.inf)
    cap = jnp.int32(max_iters if max_iters else n)

    @partial(shard_map, mesh=mesh,
             in_specs=(P("r", "c", None), P("r", "c", None),
                       P("r", "c", None), P("r", "c", None),
                       P(("r", "c"))),
             out_specs=P(("r", "c")))
    def run(srcs, dsts, masks, ws, dist0):
        def cond(st):
            _, changed, it = st
            return jnp.logical_and(changed, it < cap)

        def body(st):
            dist, _, it = st
            col = jax.lax.all_gather(dist, "r", tiled=True)
            g = jnp.take(col, srcs[0, 0], mode="clip") + ws[0, 0]
            g = jnp.where(masks[0, 0] > 0, g, INF)
            part = jax.ops.segment_min(g, dsts[0, 0],
                                       num_segments=C * chunk,
                                       indices_are_sorted=True)
            got = jax.lax.all_to_all(part.reshape(C, chunk), "c",
                                     split_axis=0, concat_axis=0)
            cand = jnp.min(got, axis=0)                 # (chunk,)
            new = jnp.minimum(dist, cand)
            changed = jax.lax.psum(
                jnp.any(new < dist).astype(jnp.int32), ("r", "c"))
            return new, changed > 0, it + 1

        out, _, _ = jax.lax.while_loop(
            cond, body, (dist0, jnp.bool_(True), jnp.int32(0)))
        return out

    run = jax.jit(run)
    sh = NamedSharding(mesh, P(("r", "c")))
    d0 = np.full(ncap, np.inf, dtype=np.float32)
    d0[source] = 0.0
    out = run(ps, pd, mask, pw, jax.device_put(d0, sh))
    return np.asarray(out)[:n]


def comm_bytes_per_iter(kind, layout, n, mesh_shape):
    """Analytic per-device collective bytes per iteration (ring model) for
    the scaling artifact's comm-volume breakdown."""
    if layout == "1d":
        nd = int(np.prod(mesh_shape))
        itm = 4  # int32 frontier / f32 rank
        return 2 * itm * n * (nd - 1) // max(nd, 1)
    if layout == "1dbm":  # bit-packed OR reduce-scatter (a2a) + tiled AG
        nd = int(np.prod(mesh_shape))
        return 2 * (n // 8) * (nd - 1) // max(nd, 1)
    R, C = mesh_shape
    chunk = -(-n // (R * C))
    if kind == "bfs":  # bitmap AG + bitmap A2A
        return (R - 1) * chunk // 8 + (C - 1) * chunk // 8
    # f32 AG along r + f32 reduce-scatter/all_to_all along c
    return (R - 1) * chunk * 4 + (C - 1) * chunk * 4
