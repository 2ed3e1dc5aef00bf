"""Bulk loader + LOAD CSV flow tests (reference: GRAPH.BULK
bulk_insert.rs + tests/flow/test_load_csv.py + the LDBC import shape of
tests/test_ldbc.py)."""

import numpy as np
import pytest

from falkordb_tpu import FalkorDB


@pytest.fixture
def g():
    return FalkorDB().select_graph("bulk")


def test_bulk_nodes_and_edges(g):
    out = g.bulk_insert(
        nodes=[(["Person"], 1000,
                {"name": [f"p{i}" for i in range(1000)],
                 "age": list(range(1000))})],
    )
    ids = out["node_ids"][0]
    assert len(ids) == 1000
    src = ids[:-1]
    dst = ids[1:]
    out2 = g.bulk_insert(edges=[("KNOWS", src, dst,
                                 {"w": list(range(999))})])
    assert out2["stats"]["relationships_created"] == 999
    r = g.query("MATCH (:Person)-[:KNOWS]->(m:Person) RETURN count(m)")
    assert r.result_set == [[999]]
    r = g.query("MATCH (p:Person {name: 'p5'})-[:KNOWS]->(q) RETURN q.name")
    assert r.result_set == [["p6"]]
    r = g.query("MATCH (p:Person) WHERE p.age >= 998 RETURN count(p)")
    assert r.result_set == [[2]]


def test_bulk_dict_form(g):
    out = g.bulk_insert(nodes=[(
        ["City"], [{"name": "tlv", "pop": 460000},
                   {"name": "nyc", "pop": 8500000}])])
    assert out["stats"]["nodes_created"] == 2
    r = g.query("MATCH (c:City) RETURN c.name ORDER BY c.pop DESC")
    assert [x[0] for x in r.result_set] == ["nyc", "tlv"]


def test_load_csv_import(g, tmp_path):
    people = tmp_path / "people.csv"
    people.write_text("id|name\n", newline="")
    with open(people, "w", newline="") as f:
        f.write("id,name,age\n")
        for i in range(50):
            f.write(f"{i},person{i},{20 + i % 30}\n")
    knows = tmp_path / "knows.csv"
    with open(knows, "w", newline="") as f:
        f.write("src,dst\n")
        for i in range(49):
            f.write(f"{i},{i + 1}\n")
    r = g.query(
        "LOAD CSV WITH HEADERS FROM $f AS row "
        "CREATE (:P {id: toInteger(row.id), name: row.name, "
        "age: toInteger(row.age)})", params={"f": str(people)})
    assert r.nodes_created == 50
    r = g.query(
        "LOAD CSV WITH HEADERS FROM $f AS row "
        "MATCH (a:P {id: toInteger(row.src)}), (b:P {id: toInteger(row.dst)}) "
        "CREATE (a)-[:KNOWS]->(b)", params={"f": str(knows)})
    assert r.relationships_created == 49
    # LDBC-interactive-read-shaped queries over the import
    r = g.query("MATCH (p:P {id: 0})-[:KNOWS*1..3]->(f:P) "
                "RETURN f.id ORDER BY f.id")
    assert [x[0] for x in r.result_set] == [1, 2, 3]
    r = g.query("MATCH (p:P) WHERE p.age = 25 RETURN count(p)")
    assert r.result_set[0][0] == 2  # ids 5 and 35


def test_load_csv_no_headers(g, tmp_path):
    f = tmp_path / "plain.csv"
    f.write_text("a,1\nb,2\n")
    r = g.query("LOAD CSV FROM $f AS row RETURN row[0], toInteger(row[1]) "
                "ORDER BY row[0]", params={"f": str(f)})
    assert r.result_set == [["a", 1], ["b", 2]]


def test_bulk_then_algorithms(g):
    out = g.bulk_insert(nodes=[(["V"], 100, {})])
    ids = out["node_ids"][0]
    ring_src = ids
    ring_dst = np.roll(ids, -1)
    g.bulk_insert(edges=[("E", ring_src, ring_dst, None)])
    r = g.query("CALL algo.WCC(null) YIELD node, componentId "
                "RETURN count(DISTINCT componentId)")
    assert r.result_set == [[1]]
