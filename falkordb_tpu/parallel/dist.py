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
    pd = np.full(cap, 0, dtype=np.int32)
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


def dist_pagerank(mesh, src_ids, dst_ids, n, iters=20, damping=0.85):
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
        r = step(ps, pd, pv, mask, r, inv_out, dangling)
        # Lockstep: on the virtual CPU mesh (more devices than cores) letting
        # dispatches queue up skews the per-device streams and the in-process
        # all-reduce rendezvous times out (rendezvous.cc).  One sync per
        # iteration keeps exactly one collective in flight; on real ICI
        # hardware collectives are hardware-sequenced and this is removable.
        jax.block_until_ready(r)
    return r
