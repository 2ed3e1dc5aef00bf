"""Multi-chip kernels on the virtual 8-device CPU mesh (the reference's
'distributed test without a cluster' pattern, SURVEY.md §4)."""

import numpy as np
import networkx as nx
import pytest

import jax

from falkordb_tpu.parallel import (
    make_mesh, dist_bfs, dist_pagerank, shard_edges_1d,
)


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {devs}"
    return make_mesh(devs[:8])


def test_shard_edges_static_shapes():
    src = np.arange(10)
    dst = np.arange(10)[::-1].copy()
    ps, pd, pv, mask = shard_edges_1d(src, dst, None, 4)
    assert ps.shape == (4, 3)
    assert mask.sum() == 10
    # dst-sorted across the flattened order
    flat_dst = pd.reshape(-1)[mask.reshape(-1) > 0]
    assert (np.diff(flat_dst) >= 0).all()


def test_dist_bfs_matches_oracle(mesh):
    G = nx.gnp_random_graph(60, 0.08, seed=5, directed=True)
    src = np.array([u for u, v in G.edges()])
    dst = np.array([v for u, v in G.edges()])
    levels = np.asarray(dist_bfs(mesh, src, dst, None, 60, source=0))
    oracle = nx.single_source_shortest_path_length(G, 0)
    for v in range(60):
        if v in oracle:
            assert levels[v] == oracle[v], (v, levels[v], oracle[v])
        else:
            assert levels[v] == -1


def test_dist_pagerank_matches_oracle(mesh):
    G = nx.gnp_random_graph(50, 0.1, seed=9, directed=True)
    src = np.array([u for u, v in G.edges()])
    dst = np.array([v for u, v in G.edges()])
    r = np.asarray(dist_pagerank(mesh, src, dst, 50, iters=60))
    oracle = nx.pagerank(G, alpha=0.85, tol=1e-10)
    for k, v in oracle.items():
        assert abs(r[k] - v) < 1e-3, (k, r[k], v)


def test_dist_pagerank_matches_single_chip(mesh):
    """Weak consistency: 8-way sharded result == single-device result."""
    rng = np.random.default_rng(0)
    src = rng.integers(0, 40, 300)
    dst = rng.integers(0, 40, 300)
    r8 = np.asarray(dist_pagerank(mesh, src, dst, 40, iters=30))
    m1 = make_mesh(jax.devices()[:1])
    r1 = np.asarray(dist_pagerank(m1, src, dst, 40, iters=30))
    np.testing.assert_allclose(r8, r1, rtol=1e-5, atol=1e-7)


def test_dist_sssp_matches_oracle(mesh):
    from falkordb_tpu.parallel.dist import dist_sssp

    rng = np.random.default_rng(8)
    G = nx.gnp_random_graph(50, 0.1, seed=8, directed=True)
    src = np.array([u for u, v in G.edges()])
    dst = np.array([v for u, v in G.edges()])
    w = rng.uniform(0.5, 3.0, len(src)).astype(np.float32)
    for (u, v), wt in zip(G.edges(), w):
        G[u][v]["weight"] = float(wt)
    d = np.asarray(dist_sssp(mesh, src, dst, w, 50, source=0))
    oracle = nx.single_source_dijkstra_path_length(G, 0)
    for v in range(50):
        if v in oracle:
            assert abs(d[v] - oracle[v]) < 1e-4, (v, d[v], oracle[v])
        else:
            assert np.isinf(d[v])


def test_dist_wcc_matches_oracle(mesh):
    from falkordb_tpu.parallel.dist import dist_wcc

    G = nx.gnp_random_graph(80, 0.03, seed=11, directed=True)
    src = np.array([u for u, v in G.edges()])
    dst = np.array([v for u, v in G.edges()])
    labels = np.asarray(dist_wcc(mesh, src, dst, 80))
    comps = list(nx.weakly_connected_components(G))
    for comp in comps:
        ls = {labels[v] for v in comp}
        assert len(ls) == 1, comp
    # distinct components get distinct labels
    reps = [labels[min(c)] for c in comps]
    assert len(set(reps)) == len(comps)


def test_dist_bfs_2d_matches_oracle():
    from falkordb_tpu.parallel.dist import dist_bfs_2d, make_mesh_2d

    devs = jax.devices()
    mesh = make_mesh_2d(devs[:8])  # 2 x 4
    assert mesh.devices.shape in ((2, 4), (4, 2))
    G = nx.gnp_random_graph(70, 0.07, seed=3, directed=True)
    src = np.array([u for u, v in G.edges()])
    dst = np.array([v for u, v in G.edges()])
    levels = dist_bfs_2d(mesh, src, dst, 70, source=1)
    oracle = nx.single_source_shortest_path_length(G, 1)
    for v in range(70):
        if v in oracle:
            assert levels[v] == oracle[v], (v, levels[v], oracle[v])
        else:
            assert levels[v] == -1


def test_algo_procedures_route_through_mesh_and_match_single_device():
    """VERDICT r1 #3: CALL algo.* on the 8-device mesh must equal the
    single-device results (dist routing reads adjacency from GraphStore)."""
    import os

    from falkordb_tpu import FalkorDB
    from falkordb_tpu.parallel import router as _router

    rng = np.random.default_rng(5)
    db = FalkorDB()
    g = db.select_graph("distroute")
    n, m = 60, 240
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    g.query("UNWIND range(0, $n - 1) AS i CREATE (:N {id: i})", {"n": n})
    g.query(
        "UNWIND $pairs AS p MATCH (a:N {id: p[0]}), (b:N {id: p[1]}) "
        "CREATE (a)-[:E {w: 1.0}]->(b)",
        {"pairs": [[int(s), int(d)] for s, d in zip(src, dst)]})

    def run_all():
        pr = g.query("CALL algo.pageRank(null, null) YIELD node, score "
                     "RETURN node.id, score").result_set
        wcc = g.query("CALL algo.WCC(null) YIELD node, componentId "
                      "RETURN node.id, componentId").result_set
        sp = g.query("MATCH (s:N {id: 0}) WITH s "
                     "CALL algo.SPpaths({sourceNode: s, targetNode: s, "
                     "relTypes: ['E']}) YIELD path RETURN 1").result_set
        ss = g.query(
            "MATCH (s:N {id: 0}) WITH s CALL algo.SSSP({sourceNode: s, "
            "weightAttribute: 'w'}) YIELD node, distance "
            "RETURN node.id, distance").result_set
        return pr, wcc, ss

    assert len(jax.devices()) >= 8
    os.environ["FALKOR_DIST"] = "0"
    try:
        pr1, wcc1, ss1 = run_all()
    finally:
        os.environ.pop("FALKOR_DIST", None)
    _router._cached_mesh = None
    pr8, wcc8, ss8 = run_all()

    s1 = {r[0]: r[1] for r in pr1}
    s8 = {r[0]: r[1] for r in pr8}
    assert set(s1) == set(s8)
    for k in s1:
        assert abs(s1[k] - s8[k]) < 2e-3, (k, s1[k], s8[k])
    # WCC: same partition (labels may differ; compare co-membership)
    def part(rows):
        by = {}
        for nid, cid in rows:
            by.setdefault(cid, set()).add(nid)
        return sorted(frozenset(v) for v in by.values())
    assert part(wcc1) == part(wcc8)
    d1 = {r[0]: r[1] for r in ss1}
    d8 = {r[0]: r[1] for r in ss8}
    assert d1 == d8


def test_dist_query_path_matches_local():
    """MATCH traversal through the sharded edge table (parallel/qdist.py)
    must emit exactly the local CSR path's result multiset — single hop,
    multi-hop joins, undirected, typed, multi-edges, var-len trails, and
    after deletes (tombstones)."""
    import os

    from falkordb_tpu import FalkorDB

    g = FalkorDB().select_graph("qdist")
    rng = np.random.default_rng(7)
    n, m = 120, 600
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    g.query("UNWIND $pairs AS p CREATE (a:N {id: p[0]}) "
            "WITH a, p MERGE (b:N {id: p[1]}) WITH a, b "
            "CREATE (a)-[:E {w: 1}]->(b)",
            {"pairs": [[int(s), int(d)] for s, d in
                       zip(src[:5], dst[:5])]})
    # bulk graph: unique nodes then edges of two types (+ multi-edges)
    g2 = FalkorDB().select_graph("qdist2")
    g2.query("UNWIND range(0, $n - 1) AS i CREATE (:N {id: i})",
             {"n": n})
    g2.query("UNWIND $pairs AS p MATCH (a:N {id: p[0]}), (b:N {id: p[1]}) "
             "CREATE (a)-[:E]->(b)",
             {"pairs": [[int(s), int(d)] for s, d in zip(src, dst)]})
    g2.query("UNWIND $pairs AS p MATCH (a:N {id: p[0]}), (b:N {id: p[1]}) "
             "CREATE (a)-[:F]->(b)",
             {"pairs": [[int(s), int(d)] for s, d in
                        zip(src[::3], dst[::3])]})
    # multi-edge duplicates
    g2.query("MATCH (a:N {id: 3}), (b:N {id: 5}) "
             "CREATE (a)-[:E]->(b), (a)-[:E]->(b)")
    g2.query("MATCH (a:N {id: 7})-[r:E]->() WITH r LIMIT 4 DELETE r")

    queries = [
        ("MATCH (a:N)-[r:E]->(b:N) RETURN a.id, b.id, id(r)", {}),
        ("MATCH (a:N {id: 3})-[r]->(b) RETURN b.id, id(r), type(r)", {}),
        ("MATCH (a:N {id: 5})<-[r:E]-(b) RETURN b.id, id(r)", {}),
        ("MATCH (a:N {id: 5})-[r]-(b) RETURN b.id, id(r)", {}),
        ("MATCH (a:N {id: 1})-[:E]->(x)-[:F]->(b) RETURN a.id, x.id, b.id",
         {}),
        ("MATCH (a:N {id: 2})-[:E*1..3]->(b) RETURN count(*), min(b.id)",
         {}),
        ("MATCH p = (a:N {id: 4})-[:E*2..2]->(b) RETURN b.id, length(p)",
         {}),
        ("MATCH (a:N) WHERE a.id < 6 OPTIONAL MATCH (a)-[r:F]->(b) "
         "RETURN a.id, b.id", {}),
    ]

    def run_all(graph):
        return [sorted(map(tuple, graph.query(q, p).result_set))
                for q, p in queries]

    os.environ["FALKOR_DIST_QUERY"] = "0"
    try:
        local = run_all(g2)
    finally:
        os.environ["FALKOR_DIST_QUERY"] = "force"
    try:
        dist = run_all(g2)
    finally:
        os.environ.pop("FALKOR_DIST_QUERY", None)
    for qi, (l, d) in enumerate(zip(local, dist)):
        assert l == d, (queries[qi][0], l[:5], d[:5])


def test_dist_query_write_invalidation():
    """Writes on a fork must not see a stale sharded edge table."""
    import os

    from falkordb_tpu import FalkorDB

    g = FalkorDB().select_graph("qdist_inv")
    g.query("CREATE (:A {id: 0})-[:R]->(:A {id: 1})")
    os.environ["FALKOR_DIST_QUERY"] = "force"
    try:
        r1 = g.query("MATCH (a)-[:R]->(b) RETURN a.id, b.id").result_set
        g.query("MATCH (a:A {id: 1}) CREATE (a)-[:R]->(:A {id: 2})")
        r2 = sorted(map(tuple,
                        g.query("MATCH (a)-[:R]->(b) "
                                "RETURN a.id, b.id").result_set))
        # same-query visibility: CREATE then MATCH inside one query
        r3 = g.query("CREATE (:A {id: 3})-[:R]->(:A {id: 4}) "
                     "WITH 1 AS one MATCH (a:A {id: 3})-[:R]->(b) "
                     "RETURN b.id").result_set
        g.query("MATCH (a:A {id: 0})-[r:R]->() DELETE r")
        r4 = sorted(map(tuple,
                        g.query("MATCH (a)-[:R]->(b) "
                                "RETURN a.id, b.id").result_set))
    finally:
        os.environ.pop("FALKOR_DIST_QUERY", None)
    assert r1 == [[0, 1]]
    assert r2 == [(0, 1), (1, 2)]
    assert r3 == [[4]]
    assert r4 == [(1, 2), (3, 4)]


def test_fused_kernels_match_oracles(mesh):
    """r4: whole-loop-fused (single dispatch) variants must equal the
    host-driven drivers' oracles — BFS/PageRank/SSSP/WCC."""
    from falkordb_tpu.parallel.dist import (
        dist_bfs_fused, dist_pagerank_fused, dist_sssp_fused,
        dist_wcc_fused)

    rng = np.random.default_rng(3)
    G = nx.gnp_random_graph(90, 0.06, seed=4, directed=True)
    src = np.array([u for u, v in G.edges()])
    dst = np.array([v for u, v in G.edges()])
    n = 90
    w = rng.uniform(0.5, 3.0, len(src)).astype(np.float32)
    for (u, v), wt in zip(G.edges(), w):
        G[u][v]["weight"] = float(wt)

    lv = np.asarray(dist_bfs_fused(mesh, src, dst, n, 0))
    bfs_oracle = nx.single_source_shortest_path_length(G, 0)
    for v in range(n):
        assert lv[v] == bfs_oracle.get(v, -1)

    r = np.asarray(dist_pagerank_fused(mesh, src, dst, n, iters=80))
    pr_oracle = nx.pagerank(G, alpha=0.85, tol=1e-12, weight=None)
    for k, v in pr_oracle.items():
        assert abs(r[k] - v) < 1e-3

    d = np.asarray(dist_sssp_fused(mesh, src, dst, w, n, 0))
    sp_oracle = nx.single_source_dijkstra_path_length(G, 0)
    for v in range(n):
        if v in sp_oracle:
            assert abs(d[v] - sp_oracle[v]) < 1e-4
        else:
            assert np.isinf(d[v])

    lab = np.asarray(dist_wcc_fused(mesh, src, dst, n))
    for comp in nx.weakly_connected_components(G):
        assert len({lab[v] for v in comp}) == 1


def test_2d_kernels_match_oracles():
    """r4: 2D-partitioned kernels (bitmap frontier exchange for BFS,
    reduce-scatter for PageRank, all_to_all-min for SSSP) on the 2x4 mesh."""
    from falkordb_tpu.parallel.dist import (
        dist_bfs_2d_bitmap, dist_pagerank_2d, dist_sssp_2d, make_mesh_2d)

    devs = jax.devices()
    mesh2 = make_mesh_2d(devs[:8])
    rng = np.random.default_rng(3)
    G = nx.gnp_random_graph(90, 0.06, seed=4, directed=True)
    src = np.array([u for u, v in G.edges()])
    dst = np.array([v for u, v in G.edges()])
    n = 90
    w = rng.uniform(0.5, 3.0, len(src)).astype(np.float32)
    for (u, v), wt in zip(G.edges(), w):
        G[u][v]["weight"] = float(wt)

    lv = dist_bfs_2d_bitmap(mesh2, src, dst, n, 0)
    bfs_oracle = nx.single_source_shortest_path_length(G, 0)
    for v in range(n):
        assert lv[v] == bfs_oracle.get(v, -1)

    r = dist_pagerank_2d(mesh2, src, dst, n, iters=80)
    pr_oracle = nx.pagerank(G, alpha=0.85, tol=1e-12, weight=None)
    for k, v in pr_oracle.items():
        assert abs(r[k] - v) < 1e-3

    d = dist_sssp_2d(mesh2, src, dst, w, n, 0)
    sp_oracle = nx.single_source_dijkstra_path_length(G, 0)
    for v in range(n):
        if v in sp_oracle:
            assert abs(d[v] - sp_oracle[v]) < 1e-4
        else:
            assert np.isinf(d[v])


def test_pack_unpack_bits_roundtrip():
    from falkordb_tpu.parallel.dist import _pack_bits, _unpack_bits
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 256).astype(np.int32)
    w = _pack_bits(jnp.asarray(bits))
    assert w.dtype == jnp.uint32 and w.shape == (8,)
    back = np.asarray(_unpack_bits(w))
    np.testing.assert_array_equal(back, bits)


def test_dist_query_auto_routing_threshold():
    """r4: the AUTO routing path (not force) must engage above
    DEFAULT_MIN_EDGES and emit exactly the local path's results."""
    import os

    from falkordb_tpu import FalkorDB
    from falkordb_tpu.parallel.qdist import (DEFAULT_MIN_EDGES,
                                             maybe_query_mesh)

    rng = np.random.default_rng(13)
    n = 5_000
    m = DEFAULT_MIN_EDGES + 8_192
    g = FalkorDB().select_graph("qdist_auto")
    out = g.bulk_insert(nodes=[(["N"], n, {"id": list(range(n))})])
    ids = out["node_ids"][0]
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    g.bulk_insert(edges=[("E", ids[src], ids[dst], None)])

    core = g._core()
    assert core.store.edge_max >= DEFAULT_MIN_EDGES
    # auto (default env): mesh engages because the graph is big enough
    assert os.environ.get("FALKOR_DIST_QUERY") is None
    assert maybe_query_mesh(core.store) is not None

    q = "MATCH (a:N {id: 77})-[:E]->(b) RETURN b.id ORDER BY b.id"
    auto = g.query(q).result_set
    os.environ["FALKOR_DIST_QUERY"] = "0"
    try:
        local = g.query(q).result_set
    finally:
        os.environ.pop("FALKOR_DIST_QUERY", None)
    assert auto == local and len(auto) > 0

    # below the threshold a fresh small graph stays local
    g2 = FalkorDB().select_graph("qdist_auto_small")
    g2.query("CREATE (:N {id: 0})-[:E]->(:N {id: 1})")
    assert maybe_query_mesh(g2._core().store) is None


def test_bfs_1d_bitmap_matches_oracle(mesh):
    """r5: the 1D fused BFS with bit-packed OR reduce-scatter exchange
    must equal the dense-psum fused kernel and the networkx oracle."""
    from falkordb_tpu.parallel.dist import dist_bfs_fused, \
        dist_bfs_fused_bitmap

    G = nx.gnp_random_graph(130, 0.05, seed=9, directed=True)
    src = np.array([u for u, v in G.edges()])
    dst = np.array([v for u, v in G.edges()])
    n = 130
    lv_bm = np.asarray(dist_bfs_fused_bitmap(mesh, src, dst, n, 0))
    lv_ps = np.asarray(dist_bfs_fused(mesh, src, dst, n, 0))[:n]
    assert (lv_bm == lv_ps).all()
    oracle = nx.single_source_shortest_path_length(G, 0)
    for v in range(n):
        assert lv_bm[v] == oracle.get(v, -1)


def test_frontier_gate_routes_point_queries_local(mesh, monkeypatch):
    """r5: auto mode must route sub-threshold frontiers to the local CSR
    path (the shard scan is O(m/p) + dispatch regardless of frontier
    size) and still produce identical results either way."""
    import os

    from falkordb_tpu import FalkorDB

    monkeypatch.setattr("falkordb_tpu.parallel.qdist.DEFAULT_MIN_EDGES", 1)
    g = FalkorDB().select_graph("gate_route")
    g.query("UNWIND range(0, 199) AS i CREATE (:N {id: i})")
    g.query("MATCH (a:N), (b:N) WHERE b.id = a.id + 1 CREATE (a)-[:E]->(b)")
    q = "MATCH (a:N {id: 5})-[:E*1..3]->(b) RETURN b.id ORDER BY b.id"
    monkeypatch.setenv("FALKOR_DIST_QUERY", "0")
    local = g.query(q).result_set
    monkeypatch.setenv("FALKOR_DIST_QUERY", "auto")
    auto = g.query(q).result_set
    monkeypatch.setenv("FALKOR_DIST_QUERY", "force")
    forced = g.query(q).result_set
    assert local == auto == forced == [[6], [7], [8]]
