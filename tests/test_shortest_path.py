"""shortestPath / allShortestPaths flow tests (reference:
tests/flow/test_all_shortest_paths.py role)."""

import pytest

from falkordb_tpu import FalkorDB
from falkordb_tpu.runtime.value import PathVal


@pytest.fixture
def g():
    gr = FalkorDB().select_graph("sp")
    # diamond: 0->1->3, 0->2->3 (two shortest), plus long way 0->4->5->3
    gr.query("UNWIND range(0, 5) AS i CREATE (:N {k: i})")
    for u, v in [(0, 1), (1, 3), (0, 2), (2, 3), (0, 4), (4, 5), (5, 3)]:
        gr.query("MATCH (a:N {k:$u}), (b:N {k:$v}) CREATE (a)-[:R]->(b)",
                 params={"u": u, "v": v})
    return gr


def test_shortest_path_single(g):
    res = g.query("MATCH (a:N {k:0}), (b:N {k:3}) "
                  "MATCH p = shortestPath((a)-[:R*]->(b)) RETURN length(p)")
    assert len(res.result_set) == 1
    assert res.result_set[0][0] == 2


def test_all_shortest_paths(g):
    res = g.query(
        "MATCH (a:N {k:0}), (b:N {k:3}) "
        "MATCH p = allShortestPaths((a)-[:R*]->(b)) "
        "RETURN [n IN nodes(p) | n.k] AS ks")
    ks = sorted(tuple(r[0]) for r in res.result_set)
    assert ks == [(0, 1, 3), (0, 2, 3)]


def test_shortest_path_free_target(g):
    res = g.query("MATCH (a:N {k:0}) "
                  "MATCH p = shortestPath((a)-[:R*]->(b)) "
                  "RETURN b.k, length(p) ORDER BY b.k")
    got = {r[0]: r[1] for r in res.result_set}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1, 5: 2}


def test_shortest_path_none_when_unreachable(g):
    g.query("CREATE (:N {k: 99})")
    res = g.query("MATCH (a:N {k:99}), (b:N {k:0}) "
                  "MATCH p = shortestPath((a)-[:R*]->(b)) RETURN p")
    assert res.result_set == []


def test_shortest_path_bounded(g):
    res = g.query("MATCH (a:N {k:0}), (b:N {k:3}) "
                  "MATCH p = shortestPath((a)-[:R*..1]->(b)) RETURN p")
    assert res.result_set == []


def test_shortest_path_incoming_direction(g):
    # (a)<-[:R*]-(b): path FROM b TO a over out-edges; the path value
    # still starts at a (round-5 fix: 'in' was previously unreachable)
    res = g.query("MATCH (a:N {k:3}), (b:N {k:0}) "
                  "MATCH p = shortestPath((a)<-[:R*]-(b)) "
                  "RETURN length(p), [n IN nodes(p) | n.k]")
    assert len(res.result_set) == 1
    ln, ks = res.result_set[0]
    assert ln == 2
    assert ks[0] == 3 and ks[-1] == 0
