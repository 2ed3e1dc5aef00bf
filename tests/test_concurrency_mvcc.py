"""MVCC + concurrency tests (reference: tests/test_concurrency.py — 1000
concurrent writes → 1000 distinct versions; tests/test_mvcc.py — readers
racing writers see consistent snapshots)."""

import threading

import pytest

from falkordb_tpu import FalkorDB


def test_concurrent_writers_distinct_versions():
    db = FalkorDB()
    g = db.select_graph("cc")
    N_THREADS, PER = 8, 25
    errors = []

    def writer(t):
        try:
            for i in range(PER):
                g.query("CREATE (:W {t: $t, i: $i})",
                        params={"t": t, "i": i})
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(t,))
               for t in range(N_THREADS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    core = db._get_or_create("cc")
    # every commit bumped the version exactly once
    assert core.store.version == N_THREADS * PER
    res = g.query("MATCH (n:W) RETURN count(*)")
    assert res.result_set == [[N_THREADS * PER]]


def test_readers_see_stable_snapshot_during_write():
    db = FalkorDB()
    g = db.select_graph("snap")
    g.query("UNWIND range(1, 100) AS i CREATE (:S {v: i})")
    core = db._get_or_create("snap")
    snapshot = core.store  # what a reader holds
    g.query("MATCH (n:S) WHERE n.v <= 50 DETACH DELETE n")
    # post-commit state
    assert g.query("MATCH (n:S) RETURN count(*)").result_set == [[50]]
    # the old snapshot still answers with the old world
    from falkordb_tpu.runtime.ops import Runtime
    from falkordb_tpu.lang.planner import plan_query
    from falkordb_tpu.lang import parse

    planned = plan_query(parse("MATCH (n:S) RETURN count(*)"))
    rt = Runtime(snapshot)
    rows = core._materialize_rows(planned, rt)
    assert rows == [[100]]


def test_write_rollback_on_error():
    db = FalkorDB()
    g = db.select_graph("rb")
    g.query("CREATE (:R {v: 1})")
    with pytest.raises(Exception):
        # division by zero mid-write aborts the whole query
        g.query("MATCH (n:R) CREATE (:R2 {v: 1}) WITH n RETURN 1/0")
    # no partial effects committed
    assert g.query("MATCH (n:R2) RETURN count(*)").result_set == [[0]]
    core = db._get_or_create("rb")
    assert core.store.version == 1  # only the first write committed


def test_constraint_violation_rolls_back():
    db = FalkorDB()
    g = db.select_graph("cv")
    g.query("CREATE (:U {k: 1})")
    core = db._get_or_create("cv")
    core.create_constraint("unique", "node", "U", ["k"])
    with pytest.raises(Exception):
        g.query("CREATE (:U {k: 1}), (:Extra)")
    assert g.query("MATCH (n:Extra) RETURN count(*)").result_set == [[0]]
    assert g.query("MATCH (n:U) RETURN count(*)").result_set == [[1]]


def test_query_mem_capacity_enforced():
    from falkordb_tpu import FalkorDB

    db = FalkorDB()
    g = db.select_graph("memcap")
    g.query("UNWIND range(1, 3000) AS i CREATE (:M {v: i})")
    db.config.query_mem_capacity = 8_192
    import pytest

    with pytest.raises(Exception, match="mem consumption exceeded"):
        g.query("MATCH (n:M) RETURN n.v ORDER BY n.v")
    db.config.query_mem_capacity = 0
    assert len(g.query("MATCH (n:M) RETURN n.v").result_set) == 3000


def test_max_queued_queries_backpressure():
    from falkordb_tpu import FalkorDB

    db = FalkorDB()
    g = db.select_graph("queue")
    db.config.max_queued_queries = 0  # reject any write admission
    import pytest

    with pytest.raises(Exception, match="Max pending queries exceeded"):
        g.query("CREATE (:Q)")
    db.config.max_queued_queries = 2**32 - 1
    g.query("CREATE (:Q)")
    assert g.query("MATCH (q:Q) RETURN count(*)").result_set == [[1]]
