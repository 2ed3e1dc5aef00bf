"""L2' tests: GraphStore container — CRUD, multi-edge, MVCC fork, flush.

Models the reference's graph-crate unit tests (SURVEY.md §4, Rust unit tier).
"""

import numpy as np
import jax.numpy as jnp

from falkordb_tpu.graph import GraphStore
from falkordb_tpu.graph.attrstore import ABSENT
from falkordb_tpu.sparse.ops import expand


def build_small():
    g = GraphStore()
    person = g.schema.label_id("Person", create=True)
    knows = g.schema.reltype_id("KNOWS", create=True)
    name = g.schema.attr_id("name", create=True)
    ids = [g.create_node([person], {name: f"p{i}"}) for i in range(4)]
    e0 = g.create_edge(ids[0], ids[1], knows, {})
    e1 = g.create_edge(ids[1], ids[2], knows, {})
    e2 = g.create_edge(ids[0], ids[1], knows, {})  # multi-edge, same pair
    return g, ids, (e0, e1, e2), (person, knows, name)


def _expand_out(g, tid, srcs):
    d = g.adj_out(tid)
    out = []
    alive = g.dev_edge_alive()
    for csr in filter(None, [d.base if int(d.base.nnz) else None, d.dp]):
        r, ds, v, ok, tot = expand(
            csr.indptr, csr.cols, csr.vals,
            jnp.asarray(srcs, dtype=jnp.int32),
            jnp.ones(len(srcs), dtype=bool), out_cap=32,
        )
        for i in range(32):
            if bool(ok[i]) and bool(alive[int(v[i])]):
                out.append((int(r[i]), int(ds[i]), int(v[i])))
    return sorted(out)


def test_create_and_multi_edge():
    g, ids, (e0, e1, e2), (person, knows, name) = build_small()
    assert g.node_count == 4 and g.edge_count == 3
    # both parallel edges 0->1 must surface as distinct matches
    got = _expand_out(g, knows, [ids[0]])
    assert got == [(0, ids[1], e0), (0, ids[1], e2)]


def test_delete_edge_tombstone_and_flush():
    g, ids, (e0, e1, e2), (person, knows, name) = build_small()
    assert g.delete_edge(e0)
    assert g.edge_count == 2
    got = _expand_out(g, knows, [ids[0]])
    assert got == [(0, ids[1], e2)]  # e0 masked by tombstone
    g.flush(force=True)
    got = _expand_out(g, knows, [ids[0]])
    assert got == [(0, ids[1], e2)]  # e0 physically gone after flush
    assert int(g.adj_out(knows).base.nnz) == 2


def test_delete_node_and_id_recycling():
    g, ids, edges, (person, knows, name) = build_small()
    for eid in g.node_edges(ids[1]):
        g.delete_edge(int(eid))
    assert g.delete_node(ids[1])
    assert g.node_count == 3
    assert not g.node_exists[ids[1]]
    nid = g.create_node([person], {})
    assert nid == ids[1]  # recycled (reserve_node, graph.rs:1288)


def test_labels_and_attrs():
    g, ids, edges, (person, knows, name) = build_small()
    dev = g.schema.label_id("Developer", create=True)
    assert g.add_label(ids[0], dev)
    assert not g.add_label(ids[0], dev)  # idempotent
    assert g.node_labels_of(ids[0]) == sorted([person, dev])
    assert g.label_counts[dev] == 1
    assert g.node_attrs.get(ids[0], name) == "p0"
    g.node_attrs.set(ids[0], name, "renamed")
    assert g.node_attrs.get(ids[0], name) == "renamed"
    assert g.node_attrs.get(ids[3], g.schema.attr_id("missing", create=True)) is ABSENT


def test_mvcc_fork_isolation():
    g, ids, (e0, e1, e2), (person, knows, name) = build_small()
    snap = g  # readers hold this
    w = g.fork()
    nid = w.create_node([person], {name: "new"})
    w.delete_edge(e1)
    w.node_attrs.set(ids[0], name, "changed")
    # writer sees its world
    assert w.node_count == 5 and w.edge_count == 2
    assert w.node_attrs.get(ids[0], name) == "changed"
    # snapshot unchanged
    assert snap.node_count == 4 and snap.edge_count == 3
    assert snap.node_attrs.get(ids[0], name) == "p0"
    assert not snap.e_deleted[e1]
    assert _expand_out(snap, knows, [ids[1]]) == [(0, ids[2], e1)]


def test_reverse_adjacency_cache():
    g, ids, (e0, e1, e2), (person, knows, name) = build_small()
    T = g.adj_in_csr(knows)
    r, c, v = T.to_numpy_coo()
    assert sorted(zip(r.tolist(), c.tolist(), v.tolist())) == sorted(
        [(ids[1], ids[0], e0), (ids[1], ids[0], e2), (ids[2], ids[1], e1)]
    )
    # cache invalidates on new edge
    e3 = g.create_edge(ids[3], ids[0], knows, {})
    T2 = g.adj_in_csr(knows)
    assert int(T2.nnz) == 4


def test_capacity_growth():
    g = GraphStore()
    l = g.schema.label_id("L", create=True)
    for i in range(100):
        g.create_node([l], {})
    assert g.node_cap >= 100
    assert g.label_counts[l] == 100
    assert int(np.sum(g.label_masks[l])) == 100


def test_memory_usage_report():
    g, *_ = build_small()
    m = g.memory_usage()
    assert m["nodes"] == 4 and m["edges"] == 3
    assert m["adjacency_bytes"] > 0
