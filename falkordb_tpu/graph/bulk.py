"""Bulk loading — vectorized creation bypassing the per-row query path
(reference: GRAPH.BULK, src/commands/bulk_insert.rs + flush_for_bulk,
graph.rs:2087).

`bulk_insert` takes columnar node/edge frames and applies them with numpy
fancy assignment + one DeltaMatrix append per relationship type."""

from __future__ import annotations

import numpy as np


def bulk_create_nodes(store, labels: list[str], count: int,
                      props: dict[str, list] | None = None) -> np.ndarray:
    """Create `count` nodes all carrying `labels`; props maps attr name →
    list of values (None entries skipped).  Returns assigned node ids."""
    ids = np.empty(count, dtype=np.int64)
    # consume free list first, then a contiguous fresh range
    nfree = min(len(store.node_free), count)
    for i in range(nfree):
        ids[i] = store.node_free.pop()
    fresh = count - nfree
    if fresh:
        start = store.node_max
        store.node_max += fresh
        store._ensure_node_cap(store.node_max)
        ids[nfree:] = np.arange(start, start + fresh)
    store._own("node_exists")
    store.node_exists[ids] = True
    store._counts["nodes"] += count
    for label in labels:
        lid = store.schema.label_id(label, create=True)
        m = store._own_label(lid)
        if len(m) < store.node_cap:
            from falkordb_tpu.graph.store import _grow_to

            m = _grow_to(m, store.node_cap, False)
            store.label_masks[lid] = m
        m[ids] = True
        store.label_counts[lid] = store.label_counts.get(lid, 0) + count
        store._invalidate(f"label:{lid}")
    if props:
        for name, values in props.items():
            aid = store.schema.attr_id(name, create=True)
            col = store.node_attrs._own(aid)
            col.grow(store.node_cap)
            for i, v in enumerate(values):
                if v is not None:
                    col.set(int(ids[i]), v)
    store._invalidate("node_exists")
    return ids


def bulk_create_edges(store, src: np.ndarray, dst: np.ndarray, reltype: str,
                      props: dict[str, list] | None = None) -> np.ndarray:
    """Create len(src) edges of one type; returns assigned edge ids."""
    from falkordb_tpu.sparse.delta import DeltaMatrix

    count = len(src)
    ids = np.empty(count, dtype=np.int64)
    nfree = min(len(store.edge_free), count)
    for i in range(nfree):
        ids[i] = store.edge_free.pop()
    fresh = count - nfree
    if fresh:
        start = store.edge_max
        store.edge_max += fresh
        store._ensure_edge_cap(store.edge_max)
        ids[nfree:] = np.arange(start, start + fresh)
    tid = store.schema.reltype_id(reltype, create=True)
    for name in ("e_src", "e_dst", "e_type", "e_deleted"):
        store._own(name)
    store.e_src[ids] = src
    store.e_dst[ids] = dst
    store.e_type[ids] = tid
    store.e_deleted[ids] = False
    d = store.adj.get(tid)
    if d is None:
        d = DeltaMatrix((store.node_cap, store.node_cap))
        store.adj[tid] = d
    d.add_edges(src, dst, ids)
    if props:
        for name, values in props.items():
            aid = store.schema.attr_id(name, create=True)
            col = store.edge_attrs._own(aid)
            col.grow(store.edge_cap)
            for i, v in enumerate(values):
                if v is not None:
                    col.set(int(ids[i]), v)
    store._counts["edges"] += count
    store.type_counts[tid] = store.type_counts.get(tid, 0) + count
    store._adj_in_cache.pop(tid, None)
    store._invalidate("e_deleted", "e_src", "e_dst", "e_type")
    return ids


def bulk_insert(core, nodes=None, edges=None) -> dict:
    """Transactional bulk insert on a GraphCore.

    nodes: list of (labels, count, props) groups or
           (labels, [prop_dict, ...]) — both supported
    edges: list of (reltype, src_ids, dst_ids, props)
    Returns stats + per-group id arrays."""
    with core._write_lock:
        store = core.store.fork()
        out_nodes = []
        out_edges = []
        stats = {"nodes_created": 0, "relationships_created": 0}
        for group in nodes or []:
            if len(group) == 2:
                labels, dicts = group
                keys = sorted({k for d in dicts for k in d})
                props = {k: [d.get(k) for d in dicts] for k in keys}
                count = len(dicts)
            else:
                labels, count, props = group
            ids = bulk_create_nodes(store, list(labels), count, props)
            stats["nodes_created"] += count
            out_nodes.append(ids)
        for (reltype, src, dst, props) in edges or []:
            ids = bulk_create_edges(store, np.asarray(src, dtype=np.int64),
                                    np.asarray(dst, dtype=np.int64),
                                    reltype, props)
            stats["relationships_created"] += len(ids)
            out_edges.append(ids)
        store.flush(force=True)  # flush_for_bulk (graph.rs:2087)
        core.store = store
        core._reindex(None)
    return {"stats": stats, "node_ids": out_nodes, "edge_ids": out_edges}
