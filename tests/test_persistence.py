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
