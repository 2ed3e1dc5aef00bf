"""Checkpoint/restore round-trip tests (reference: RDB v19 persistency flow
tests, tests/flow/test_persistency.py role)."""

import numpy as np
import pytest

from falkordb_tpu import FalkorDB
from falkordb_tpu.runtime.value import PointVal, VectorF32


def build(db):
    g = db.select_graph("p1")
    g.query("CREATE (:Person {name:'Ann', age: 34, tags: ['x','y'], "
            "score: 1.5, ok: true})-[:KNOWS {since: 2020}]->"
            "(:Person {name:'Bob'})")
    g.query("CREATE (:City {at: point({latitude: 32.1, longitude: 34.8})})")
    g.query("CREATE (:Doc {emb: vecf32([1.0, 2.0, 3.0])})")
    g.query("CREATE INDEX FOR (p:Person) ON (p.age)")
    g2 = db.select_graph("p2")
    g2.query("UNWIND range(1, 50) AS i CREATE (:N {v: i})")
    g2.query("MATCH (a:N), (b:N) WHERE b.v = a.v + 1 CREATE (a)-[:NEXT]->(b)")
    # deletions + recycling must survive the round trip
    g2.query("MATCH (n:N {v: 25}) DETACH DELETE n")
    return db


def test_save_load_roundtrip(tmp_path):
    db = build(FalkorDB())
    db.save(str(tmp_path / "ckpt"))
    db2 = FalkorDB.load(str(tmp_path / "ckpt"))
    assert set(db2.list_graphs()) == {"p1", "p2"}
    g = db2.select_graph("p1")
    r = g.query("MATCH (a:Person)-[k:KNOWS]->(b:Person) "
                "RETURN a.name, a.age, a.tags, a.score, a.ok, k.since, b.name")
    assert r.result_set == [["Ann", 34, ["x", "y"], 1.5, True, 2020, "Bob"]]
    r = g.query("MATCH (c:City) RETURN c.at")
    assert isinstance(r.result_set[0][0], PointVal)
    r = g.query("MATCH (d:Doc) RETURN d.emb")
    assert isinstance(r.result_set[0][0], VectorF32)
    # index survived and is used
    plan = g.explain("MATCH (p:Person) WHERE p.age > 30 RETURN p")
    assert "Index Scan" in plan
    g2 = db2.select_graph("p2")
    assert g2.query("MATCH (n:N) RETURN count(*)").result_set == [[49]]
    r = g2.query("MATCH (:N {v:1})-[:NEXT*]->(x) RETURN count(x)")
    assert r.result_set == [[23]]  # chain broken at 25


def test_writes_after_load(tmp_path):
    db = build(FalkorDB())
    db.save(str(tmp_path / "c2"))
    db2 = FalkorDB.load(str(tmp_path / "c2"))
    g2 = db2.select_graph("p2")
    # id recycling continues where it left off
    r = g2.query("CREATE (n:N {v: 999}) RETURN id(n)")
    nid = r.result_set[0][0]
    assert g2.query("MATCH (n:N) RETURN count(*)").result_set == [[50]]
    g2.query("MATCH (a:N {v: 24}), (b:N {v: 999}) CREATE (a)-[:NEXT]->(b)")
    r = g2.query("MATCH (:N {v:1})-[:NEXT*]->(x) RETURN count(x)")
    assert r.result_set == [[24]]


def test_constraints_survive(tmp_path):
    db = FalkorDB()
    g = db.select_graph("pc")
    g.query("CREATE (:U {k: 1})")
    db._get_or_create("pc").create_constraint("unique", "node", "U", ["k"])
    db.save(str(tmp_path / "c3"))
    db2 = FalkorDB.load(str(tmp_path / "c3"))
    g2 = db2.select_graph("pc")
    with pytest.raises(Exception):
        g2.query("CREATE (:U {k: 1})")


def test_vkey_chunked_roundtrip(tmp_path):
    """Graphs above VKEY_MAX_ENTITY_COUNT are checkpointed as virtual-key
    chunks (src/redis_type.rs:316-338 role) and restore identically."""
    db = build(FalkorDB())
    db.config.vkey_max_entity_count = 16  # force chunking on tiny graphs
    db.save(str(tmp_path / "ck"))
    import os

    assert os.path.isdir(str(tmp_path / "ck" / "p2" / "vkeys"))
    n_chunks = len(os.listdir(str(tmp_path / "ck" / "p2" / "vkeys")))
    assert n_chunks > 3  # 50 nodes + 49 edges at <=16 entities/chunk
    db2 = FalkorDB.load(str(tmp_path / "ck"))
    g = db2.select_graph("p1")
    r = g.query("MATCH (a:Person)-[k:KNOWS]->(b) RETURN a.name, k.since, "
                "b.name")
    assert r.result_set == [["Ann", 2020, "Bob"]]
    plan = g.explain("MATCH (p:Person) WHERE p.age > 30 RETURN p")
    assert "Index Scan" in plan
    g2 = db2.select_graph("p2")
    assert g2.query("MATCH (n:N) RETURN count(*)").result_set == [[49]]
    r = g2.query("MATCH (:N {v:1})-[:NEXT*]->(x) RETURN count(x)")
    assert r.result_set == [[23]]
    # id recycling preserved: next node reuses the deleted slot
    g2.query("CREATE (:N {v: 999})")
    assert g2.query("MATCH (n:N) RETURN count(*)").result_set == [[50]]


def test_vkey_dump_restore_direct():
    from falkordb_tpu.persist.dump import (dump_graph_vkeys,
                                           restore_graph_vkeys)

    db = build(FalkorDB())
    core = db._get_or_create("p2")
    chunks = dump_graph_vkeys(core, max_entities=10)
    names = [n for n, _ in chunks]
    assert any("_vkey_meta" in n for n in names)
    db2 = FalkorDB()
    core2 = db2._get_or_create("p2")
    # restore must be order-insensitive
    import random

    payloads = [p for _, p in chunks]
    random.Random(4).shuffle(payloads)
    restore_graph_vkeys(core2, payloads)
    g2 = db2.select_graph("p2")
    assert g2.query("MATCH (a:N)-[:NEXT]->(b:N) RETURN count(*)"
                    ).result_set == [[47]]


def test_aof_v1_migration(tmp_path):
    """r4: a round-2 (v1) log with pickled QUERY records upgrades via
    migrate_v1 and replays fully; unmigrated replay raises (never silently
    drops write history)."""
    import pickle
    import struct

    import pytest

    from falkordb_tpu import FalkorDB
    from falkordb_tpu.persist.aof import EffectsLog, K_QUERY

    path = str(tmp_path / "v1.aof")
    # hand-write a v1-format log: [u32 len][u8 kind][payload]
    with open(path, "wb") as f:
        for text, params in [
                ("CREATE (:V {id: $i})", {"i": 1}),
                ("CREATE (:V {id: $i})", {"i": 2}),
                ("MATCH (v:V {id: 1}) SET v.seen = true", None)]:
            payload = pickle.dumps((text, params))
            f.write(struct.pack("<IB", len(payload), K_QUERY) + payload)

    with pytest.raises(ValueError, match="migrate_v1"):
        list(EffectsLog.records(path))

    n = EffectsLog.migrate_v1(path)
    assert n == 3
    # now a well-formed v2 log
    recs = list(EffectsLog.records(path))
    assert [k for k, _ in recs] == [K_QUERY] * 3

    g = FalkorDB().select_graph("aof_v1mig")
    EffectsLog.replay(path, g._core())
    assert g.query("MATCH (v:V) RETURN count(*)").result_set == [[2]]
    assert g.query("MATCH (v:V {id: 1}) RETURN v.seen").result_set == \
        [[True]]


def test_aof_v1_migration_rejects_malicious_pickle(tmp_path):
    """A v1 payload whose pickle references any global must be refused."""
    import pickle
    import struct

    import pytest

    from falkordb_tpu.persist.aof import EffectsLog, K_QUERY

    path = str(tmp_path / "evil.aof")

    class Evil:
        def __reduce__(self):
            return (len, ([1, 2],))  # any global lookup must be blocked

    payload = pickle.dumps(("CREATE (n)", Evil()))
    with open(path, "wb") as f:
        f.write(struct.pack("<IB", len(payload), K_QUERY) + payload)
    with pytest.raises(Exception, match="forbids global"):
        EffectsLog.migrate_v1(path)


def test_temporal_values_checkpoint_roundtrip(tmp_path):
    """r5: anchored-encoding durations + dates/datetimes/times survive
    the checkpoint codec byte-exactly."""
    import datetime as dt

    from falkordb_tpu import FalkorDB
    from falkordb_tpu.persist.checkpoint import load_db, save_db

    db = FalkorDB()
    g = db.select_graph("tckpt")
    g.query("CREATE (:E {d: date('2024-02-29'), t: duration('P1M2DT3H'), "
            "dtm: localdatetime('2024-01-01T10:30:00'), "
            "tm: localtime('10:30:15')})")
    save_db(db, str(tmp_path))
    g2 = load_db(str(tmp_path)).select_graph("tckpt")
    r = g2.query("MATCH (e:E) RETURN e.d, e.t, e.dtm, e.tm")
    assert r.result_set == [[
        dt.date(2024, 2, 29), dt.timedelta(days=33, seconds=10800),
        dt.datetime(2024, 1, 1, 10, 30), dt.time(10, 30, 15)]]
    # arithmetic still calendar-aware after reload
    r2 = g2.query("MATCH (e:E) RETURN e.d + e.t")
    assert r2.result_set == [[dt.date(2024, 3, 31)]]
