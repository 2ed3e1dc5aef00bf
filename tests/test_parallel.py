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
