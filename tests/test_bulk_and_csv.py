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


# ---------------------------------------------------------------- BI_* binary


def test_bulk_binary_token_roundtrip():
    from falkordb_tpu.graph.bulk import (decode_edge_token,
                                         decode_node_token,
                                         encode_edge_token,
                                         encode_node_token)

    tok = encode_node_token(
        ["Person", "Actor"], ["name", "age", "tags", "score"],
        [["Alice", 33, ["a", ["b", 1]], 1.5],
         ["Bob", None, [], 2.0]])
    labels, dicts = decode_node_token(tok)
    assert labels == ["Person", "Actor"]
    assert dicts[0] == {"name": "Alice", "age": 33,
                        "tags": ["a", ["b", 1]], "score": 1.5}
    assert dicts[1] == {"name": "Bob", "tags": [], "score": 2.0}

    et = encode_edge_token("KNOWS", ["since"], [(0, 1, 1999), (1, 0, None)])
    rel, srcs, dsts, props = decode_edge_token(et)
    assert rel == "KNOWS" and srcs == [0, 1] and dsts == [1, 0]
    assert props == [{"since": 1999}, {}]


def test_bulk_binary_insert():
    from falkordb_tpu.api import FalkorDB
    from falkordb_tpu.graph.bulk import (bulk_insert_binary,
                                         encode_edge_token,
                                         encode_node_token)

    db = FalkorDB()
    core = db._get_or_create("bulkbin")
    ntok = encode_node_token(["P"], ["name"],
                             [["a"], ["b"], ["c"]])
    etok = encode_edge_token("R", ["w"], [(0, 1, 1.0), (1, 2, 2.0)])
    out = bulk_insert_binary(core, [ntok], [etok], 3, 2)
    assert out["stats"] == {"nodes_created": 3, "relationships_created": 2}
    rs = core.query("MATCH (a:P)-[r:R]->(b:P) RETURN a.name, r.w, b.name "
                    "ORDER BY r.w").result_set
    assert rs == [["a", 1.0, "b"], ["b", 2.0, "c"]]


def test_bulk_binary_server_dispatch():
    """GRAPH.BULK BEGIN binary form through the server dispatch path
    (src/commands/bulk_insert.rs arg layout)."""
    from falkordb_tpu.graph.bulk import encode_edge_token, encode_node_token
    from falkordb_tpu.server.server import GraphServer

    srv = GraphServer(port=0)
    ntok = encode_node_token(["City"], ["name"], [["rome"], ["oslo"]])
    etok = encode_edge_token("ROAD", [], [(0, 1)])
    args = ["GRAPH.BULK", "g1", "BEGIN", "2", "1", "1", "1",
            ntok.decode("utf-8", errors="surrogateescape"),
            etok.decode("utf-8", errors="surrogateescape")]
    reply = srv.dispatch(args)
    assert "2 nodes created" in str(reply)
    rs = srv.db._get_or_create("g1").query(
        "MATCH (a:City)-[:ROAD]->(b:City) RETURN a.name, b.name").result_set
    assert rs == [["rome", "oslo"]]
    # BEGIN on an existing key must fail and leave the graph intact
    import pytest as _pytest

    from falkordb_tpu.server.resp import RespError

    with _pytest.raises(RespError, match="already exists"):
        srv.dispatch(args)


def test_bulk_binary_failed_begin_leaves_no_key():
    from falkordb_tpu.server.resp import RespError
    from falkordb_tpu.server.server import GraphServer

    srv = GraphServer(port=0)
    with pytest.raises(Exception):
        srv.dispatch(["GRAPH.BULK", "gbad", "BEGIN", "1", "0", "1", "0",
                      "\x07garbage"])
    assert "gbad" not in srv.db.list_graphs()
