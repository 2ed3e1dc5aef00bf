"""Incremental index maintenance, composite + geo indexes, background
population (VERDICT r1 items 4 & 5; reference:
graph/src/graph/graph.rs:337-420, index/indexer.rs:19-37,
planner/optimizer/utilize_index.rs)."""

import time

import pytest

from falkordb_tpu import FalkorDB


@pytest.fixture
def db():
    return FalkorDB()


@pytest.fixture
def g(db):
    return db.select_graph("ix")


def _core(g):
    return g._core()


def test_write_does_o_changed_work(g, monkeypatch):
    """A single-row write against a big indexed graph must NOT rebuild the
    index (the VERDICT item-4 'count rebuilds' test)."""
    g.query("UNWIND range(0, 9999) AS i CREATE (:P {v: i})")
    g.query("CREATE INDEX FOR (p:P) ON (p.v)")
    import falkordb_tpu.index.manager as M

    builds = {"n": 0}
    orig = M.build_index

    def counting_build(store, d):
        builds["n"] += 1
        return orig(store, d)

    monkeypatch.setattr(M, "build_index", counting_build)
    for i in range(20):
        g.query(f"CREATE (:P {{v: {100000 + i}}})")
    assert builds["n"] == 0, "writes must take the incremental path"
    res = g.query("MATCH (p:P) WHERE p.v >= 100000 RETURN count(p)")
    assert res.result_set[0][0] == 20
    # updates + deletes maintain the index too
    g.query("MATCH (p:P) WHERE p.v = 100000 SET p.v = 250000")
    g.query("MATCH (p:P) WHERE p.v = 100001 DELETE p")
    assert builds["n"] == 0
    assert g.query("MATCH (p:P) WHERE p.v = 250000 RETURN count(p)"
                   ).result_set[0][0] == 1
    assert g.query("MATCH (p:P) WHERE p.v = 100001 RETURN count(p)"
                   ).result_set[0][0] == 0
    assert g.query("MATCH (p:P) WHERE p.v >= 100000 RETURN count(p)"
                   ).result_set[0][0] == 19


def test_index_scan_used_and_correct_after_many_deltas(g):
    g.query("UNWIND range(0, 2999) AS i CREATE (:T {v: i % 100})")
    g.query("CREATE INDEX FOR (t:T) ON (t.v)")
    # push past MERGE_THRESHOLD so compaction paths run
    g.query("MATCH (t:T) WHERE t.v = 7 SET t.v = 1007")
    g.query("UNWIND range(0, 2999) AS i CREATE (:T {v: 100 + (i % 50)})")
    plan = g.explain("MATCH (t:T) WHERE t.v > 120 RETURN t")
    assert "Index Scan" in plan
    got = g.query("MATCH (t:T) WHERE t.v > 120 RETURN count(t)")
    want = 3000 // 50 * len([v for v in range(120 + 1, 150)]) \
        + 30  # 1007-valued rows
    assert got.result_set[0][0] == want


def test_composite_index_single_scan(g):
    g.query("UNWIND range(0, 999) AS i "
            "CREATE (:C {a: i % 10, b: i % 7, c: i})")
    g.query("CREATE INDEX FOR (c:C) ON (c.a, c.b)")
    plan = g.explain("MATCH (c:C) WHERE c.a = 3 AND c.b > 2 RETURN c")
    assert "Index Scan" in plan and "[a, b]" in plan
    got = g.query("MATCH (c:C) WHERE c.a = 3 AND c.b > 2 RETURN count(c)")
    want = len([i for i in range(1000) if i % 10 == 3 and i % 7 > 2])
    assert got.result_set[0][0] == want


def test_in_list_seek(g):
    g.query("UNWIND range(0, 499) AS i CREATE (:L {v: i})")
    g.query("CREATE INDEX FOR (l:L) ON (l.v)")
    plan = g.explain("MATCH (l:L) WHERE l.v IN [3, 7, 1000] RETURN l")
    assert "Index Scan" in plan
    got = g.query("MATCH (l:L) WHERE l.v IN [3, 7, 1000] "
                  "RETURN l.v ORDER BY l.v")
    assert [r[0] for r in got.result_set] == [3, 7]


def test_geo_distance_index_scan(g):
    # a grid of points around (40, -70)
    g.query("UNWIND range(0, 20) AS i UNWIND range(0, 20) AS j "
            "CREATE (:Place {loc: point({latitude: 39.0 + i * 0.1, "
            "longitude: -71.0 + j * 0.1}), id: i * 100 + j})")
    g.query("CREATE INDEX FOR (p:Place) ON (p.loc)")
    q = ("MATCH (p:Place) WHERE distance(p.loc, point({latitude: 40.0, "
         "longitude: -70.0})) < 25000 RETURN p.id ORDER BY p.id")
    plan = g.explain(q)
    assert "Index Scan" in plan
    got = [r[0] for r in g.query(q).result_set]
    # oracle via full scan on an unindexed copy
    g2 = g._db.select_graph("ix_oracle")
    g2.query("UNWIND range(0, 20) AS i UNWIND range(0, 20) AS j "
             "CREATE (:Place {loc: point({latitude: 39.0 + i * 0.1, "
             "longitude: -71.0 + j * 0.1}), id: i * 100 + j})")
    want = [r[0] for r in g2.query(q).result_set]
    assert got == want and len(got) > 0


def test_bool_and_param_bounds_fall_back_exactly(g):
    g.query("CREATE (:B {f: true, v: 1}), (:B {f: false, v: 2}), "
            "(:B {v: 3})")
    g.query("CREATE INDEX FOR (b:B) ON (b.f)")
    got = g.query("MATCH (b:B) WHERE b.f = true RETURN b.v")
    assert [r[0] for r in got.result_set] == [1]
    g.query("CREATE INDEX FOR (b:B) ON (b.v)")
    got = g.query("MATCH (b:B) WHERE b.v >= $lo RETURN b.v ORDER BY b.v",
                  params={"lo": 2})
    assert [r[0] for r in got.result_set] == [2, 3]
    got = g.query("MATCH (b:B) WHERE b.v >= $lo RETURN b.v",
                  params={"lo": None})
    assert got.result_set == []


def test_background_population_lifecycle(db):
    g = db.select_graph("ix_bg")
    g.query("UNWIND range(0, 4999) AS i CREATE (:BG {v: i})")
    core = g._core()
    core.config.delay_indexing = True
    try:
        g.query("CREATE INDEX FOR (b:BG) ON (b.v)")
        # a write that lands while (possibly) under construction
        g.query("CREATE (:BG {v: 99999})")
        # queries stay correct regardless of status (label-scan fallback)
        assert g.query("MATCH (b:BG) WHERE b.v = 4999 RETURN count(b)"
                       ).result_set[0][0] == 1
        deadline = time.time() + 20
        d = next(iter(core.indexes.values()))
        while d.status != "operational" and time.time() < deadline:
            time.sleep(0.05)
        assert d.status == "operational"
        plan = g.explain("MATCH (b:BG) WHERE b.v < 10 RETURN b")
        assert "Index Scan" in plan
        assert g.query("MATCH (b:BG) WHERE b.v = 99999 RETURN count(b)"
                       ).result_set[0][0] == 1
    finally:
        core.config.delay_indexing = False
