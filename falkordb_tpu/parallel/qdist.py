"""Device-sharded MATCH traversal — the query path on the mesh.

SURVEY.md §2.3.4: the reference's only scale-out of the database itself is
Redis replication + OSS-cluster key sharding (whole graphs pinned to one
shard, src/graph_core.rs:1465-1505).  The TPU-native design instead shards
ONE graph's edge set across the device mesh and runs the MATCH expansion —
the hot structural join inside ConditionalTraverse / VarLenTraverse — as a
shard_map kernel:

  * the global edge table (src, dst, type, alive, eid) is partitioned into
    equal static shards over the mesh's 'e' axis and cached on the
    immutable GraphStore snapshot (fork() drops the cache; in-place writes
    invalidate it through GraphStore._invalidate's prefix pop);
  * a frontier of batch source nodes is deduped, sorted, padded to a
    power-of-two bucket and REPLICATED — each device scans its O(m/p) edge
    shard with a vectorised binary-search membership test and compacts the
    hits into a fixed-capacity frame (overflow detected via a per-device
    hit count, host retries with a doubled cap);
  * the host joins matched (unique-src, dst, eid) triples back to batch
    rows with one vectorised group-expand — multiplicities from duplicate
    source bindings are exact.

Every orientation of an undirected pattern is a separate endpoint pass, so
semantics match the CSR path exactly (self-loops bind once: the reversed
pass drops them, mirroring Traverse._matrices' drop_self flag).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from falkordb_tpu.parallel.router import maybe_mesh

_SENTINEL = np.int32(2**31 - 1)

# below this edge count a single chip wins (per-dispatch overhead + the
# replicated frontier exchange dominate); "force" routes regardless (tests,
# dryrun)
DEFAULT_MIN_EDGES = 200_000


def min_frontier():
    """Frontier size below which the local CSR path beats the mesh scan:
    the shard kernel's cost is O(m/p) + dispatch REGARDLESS of frontier
    size, so a point lookup on the mesh pays ~10 ms to do ~1 ms of work
    (QDIST r5).  Routable per query via FALKOR_DIST_MIN_FRONTIER;
    "force" mode ignores it."""
    return int(os.environ.get("FALKOR_DIST_MIN_FRONTIER", "4096"))


def frontier_gate(n_frontier: int) -> bool:
    """True when the mesh route should run for this frontier."""
    if os.environ.get("FALKOR_DIST_QUERY", "auto") == "force":
        return True
    return n_frontier >= min_frontier()


def maybe_query_mesh(g):
    """The mesh for MATCH-path expansion, or None.

    FALKOR_DIST_QUERY: "0" off, "force" always (tests/dryrun), "auto"
    (default) routes when >1 device is visible and the graph is large
    enough for the scan to amortise the collective exchange."""
    mode = os.environ.get("FALKOR_DIST_QUERY", "auto")
    if mode == "0":
        return None
    mesh = maybe_mesh()
    if mesh is None or "e" not in mesh.axis_names:
        return None
    if mode == "force":
        return mesh
    return mesh if g.edge_max >= DEFAULT_MIN_EDGES else None


def edge_table(g, mesh):
    """The snapshot's sharded global edge table (cached per mesh width)."""
    nd = mesh.devices.size
    # keyed under e_deleted: every edge mutation (create, delete, recycle)
    # invalidates that array, so the prefix pop catches them all
    key = f"e_deleted:dist:{nd}"
    cached = g._dev.get(key)
    if cached is not None:
        return cached
    m = int(g.edge_max)
    per = -(-max(m, 1) // nd)
    cap = per * nd
    es = np.zeros(cap, np.int32)
    ed = np.zeros(cap, np.int32)
    et = np.full(cap, -1, np.int32)
    alive = np.zeros(cap, bool)
    if m:
        es[:m] = g.e_src[:m]
        ed[:m] = g.e_dst[:m]
        et[:m] = g.e_type[:m]
        alive[:m] = ~g.e_deleted[:m]
    eid = np.arange(cap, dtype=np.int32)
    sh = NamedSharding(mesh, P("e"))
    tbl = tuple(jax.device_put(a, sh) for a in (es, ed, et, alive, eid))
    g._dev[key] = tbl
    return tbl


@partial(jax.jit,
         static_argnames=("mesh", "cap", "endpoint", "drop_self"))
def _expand_kernel(mesh, es, ed, et, alive, eid, uniq, tlut, *,
                   cap, endpoint, drop_self):
    """Per-device edge-shard scan → fixed-cap compacted match frame(s).

    endpoint 0 = outgoing, 1 = incoming, 2 = BOTH orientations from ONE
    scan (the undirected case: one dispatch + one shard pass instead of
    two; each orientation still compacts its own frame so an edge whose
    endpoints are both in the frontier binds twice, as it must)."""

    def orient(es, ed, et, alive, eid, uniq, tlut, ep, drop):
        key = es if ep == 0 else ed
        pos = jnp.searchsorted(uniq, key).astype(jnp.int32)
        posc = jnp.clip(pos, 0, uniq.shape[0] - 1)
        hit = (jnp.take(uniq, posc) == key) & alive & (et >= 0)
        hit &= jnp.take(tlut, jnp.clip(et, 0, tlut.shape[0] - 1))
        if drop:
            hit &= es != ed
        cnt = jnp.sum(hit.astype(jnp.int32))
        idx = jnp.nonzero(hit, size=cap, fill_value=es.shape[0] - 1)[0]
        vmask = jnp.arange(cap, dtype=jnp.int32) < jnp.minimum(cnt, cap)
        uid = jnp.where(vmask, jnp.take(posc, idx), -1)
        other = ed if ep == 0 else es
        dst = jnp.where(vmask, jnp.take(other, idx), -1)
        oeid = jnp.where(vmask, jnp.take(eid, idx), -1)
        return uid, dst, oeid, vmask, cnt[None]

    def shard(es, ed, et, alive, eid, uniq, tlut):
        if endpoint != 2:
            return orient(es, ed, et, alive, eid, uniq, tlut,
                          endpoint, drop_self)
        o0 = orient(es, ed, et, alive, eid, uniq, tlut, 0, False)
        o1 = orient(es, ed, et, alive, eid, uniq, tlut, 1, True)
        return o0 + o1

    nout = 5 if endpoint != 2 else 10
    return shard_map(
        shard, mesh=mesh,
        in_specs=(P("e"), P("e"), P("e"), P("e"), P("e"), P(None), P(None)),
        out_specs=tuple(P("e") for _ in range(nout)),
    )(es, ed, et, alive, eid, uniq, tlut)


def _type_lut(g, tids):
    n = max(len(g.schema.reltypes), 1)
    lut = np.zeros(n, bool)
    if tids is None:
        lut[:] = True
    else:
        for t in tids:
            if 0 <= t < n:
                lut[t] = True
    return lut


def expand_rows(g, mesh, srcs, valid, tids, direction):
    """Distributed one-hop expansion of a batch frontier.

    srcs: int64 node ids per batch row; valid: bool per row; tids: list of
    relationship type ids or None (all).  Returns (row, dst, eid) int64
    arrays — one entry per (batch row, matching live edge, orientation),
    exactly the multiset the CSR path emits.
    """
    valid_rows = np.nonzero(np.asarray(valid, bool)
                            & (srcs >= 0))[0]
    if len(valid_rows) == 0:
        z = np.zeros(0, np.int64)
        return z, z, z
    keys = srcs[valid_rows].astype(np.int64)
    perm = np.argsort(keys, kind="stable")
    sorted_keys = keys[perm]
    uniq = np.unique(sorted_keys).astype(np.int32)
    bpad = 1
    while bpad < len(uniq):
        bpad *= 2
    uniq_pad = np.full(bpad, _SENTINEL, np.int32)
    uniq_pad[: len(uniq)] = uniq
    tlut = _type_lut(g, tids)
    tbl = edge_table(g, mesh)
    # one kernel regardless of orientation count: 'both' runs both
    # orientations from a single shard scan (endpoint=2; the reversed
    # orientation drops self-loops so a loop binds once,
    # Traverse._matrices drop_self)
    endpoint = {"out": 0, "in": 1, "both": 2}[direction]

    starts = np.searchsorted(sorted_keys, uniq, side="left")
    ends = np.searchsorted(sorted_keys, uniq, side="right")
    counts = (ends - starts).astype(np.int64)

    rows_all, dsts_all, eids_all = [], [], []
    uniq_j = jnp.asarray(uniq_pad)
    tlut_j = jnp.asarray(tlut)
    cap = 2048
    while True:
        out = _expand_kernel(mesh, *tbl, uniq_j, tlut_j,
                             cap=cap, endpoint=endpoint, drop_self=False)
        frames = [out[i:i + 5] for i in range(0, len(out), 5)]
        mx = max((int(np.asarray(f[4]).max()) for f in frames), default=0)
        if mx <= cap:
            break
        while cap < mx:
            cap *= 2
    for uid, dst, eid, vmask, _cnt in frames:
        vm = np.asarray(vmask)
        u = np.asarray(uid)[vm].astype(np.int64)
        d = np.asarray(dst)[vm].astype(np.int64)
        e = np.asarray(eid)[vm].astype(np.int64)
        if len(u) == 0:
            continue
        # join matched unique sources back to their batch rows
        rep = counts[u]
        total = int(rep.sum())
        if total == 0:
            continue
        base = np.repeat(starts[u], rep)
        csum = np.cumsum(rep) - rep
        offs = np.arange(total, dtype=np.int64) - np.repeat(csum, rep)
        rows_all.append(valid_rows[perm[base + offs]])
        dsts_all.append(np.repeat(d, rep))
        eids_all.append(np.repeat(e, rep))
    if not rows_all:
        z = np.zeros(0, np.int64)
        return z, z, z
    row = np.concatenate(rows_all)
    dst = np.concatenate(dsts_all)
    eid = np.concatenate(eids_all)
    # deterministic frame order: (row, eid)
    order = np.lexsort((eid, row))
    return row[order], dst[order], eid[order]
