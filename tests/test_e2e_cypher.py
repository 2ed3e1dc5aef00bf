"""End-to-end Cypher slice tests (the reference's flow-test tier,
tests/flow/).  Includes the MotoGP README demo (BASELINE.json config 1)."""

import numpy as np
import pytest

from falkordb_tpu import FalkorDB
from falkordb_tpu.runtime.value import NodeVal, EdgeVal, PathVal


@pytest.fixture
def db():
    return FalkorDB()


@pytest.fixture
def g(db):
    return db.select_graph("test")


def test_motogp_demo(g):
    r = g.query(
        "CREATE (:Rider {name:'Valentino Rossi'})-[:rides]->(:Team {name:'Yamaha'}), "
        "(:Rider {name:'Dani Pedrosa'})-[:rides]->(:Team {name:'Honda'}), "
        "(:Rider {name:'Andrea Dovizioso'})-[:rides]->(:Team {name:'Ducati'})"
    )
    assert r.nodes_created == 6
    assert r.relationships_created == 3
    assert r.properties_set == 6
    res = g.query(
        "MATCH (r:Rider)-[:rides]->(t:Team) WHERE t.name = 'Yamaha' "
        "RETURN r.name, t.name"
    )
    assert res.header == ["r.name", "t.name"]
    assert res.result_set == [["Valentino Rossi", "Yamaha"]]
    res = g.query(
        "MATCH (r:Rider)-[:rides]->(t:Team) RETURN r.name, t.name ORDER BY r.name"
    )
    assert [row[0] for row in res.result_set] == [
        "Andrea Dovizioso", "Dani Pedrosa", "Valentino Rossi"]


def test_create_return_node(g):
    res = g.query("CREATE (n:Person {name:'Al', age:30}) RETURN n")
    node = res.result_set[0][0]
    assert isinstance(node, NodeVal)
    assert node.labels == ["Person"] and node.properties["age"] == 30


def test_match_all_nodes(g):
    g.query("CREATE (:A), (:B), (:C)")
    res = g.query("MATCH (n) RETURN n")
    assert len(res.result_set) == 3


def test_where_filters(g):
    g.query("UNWIND range(1, 10) AS i CREATE (:N {v: i})")
    res = g.query("MATCH (n:N) WHERE n.v > 7 RETURN n.v ORDER BY n.v")
    assert [r[0] for r in res.result_set] == [8, 9, 10]
    res = g.query("MATCH (n:N) WHERE n.v % 2 = 0 AND n.v < 5 RETURN n.v ORDER BY n.v")
    assert [r[0] for r in res.result_set] == [2, 4]


def test_multi_hop(g):
    g.query("CREATE (a:P {n:'a'})-[:R]->(b:P {n:'b'})-[:R]->(c:P {n:'c'})")
    res = g.query("MATCH (x:P)-[:R]->()-[:R]->(z:P) RETURN x.n, z.n")
    assert res.result_set == [["a", "c"]]


def test_direction_and_both(g):
    g.query("CREATE (a:X {n:1})-[:R]->(b:X {n:2})")
    assert g.query("MATCH (a)<-[:R]-(b) RETURN a.n, b.n").result_set == [[2, 1]]
    both = g.query("MATCH (a)-[:R]-(b) RETURN a.n, b.n ORDER BY a.n").result_set
    assert both == [[1, 2], [2, 1]]


def test_edge_var_and_props(g):
    g.query("CREATE (:A {n:1})-[:R {w: 5}]->(:B {n:2})")
    res = g.query("MATCH (a)-[r:R]->(b) RETURN r.w, type(r)")
    assert res.result_set == [[5, "R"]]
    res = g.query("MATCH (a)-[r:R {w: 5}]->(b) RETURN b.n")
    assert res.result_set == [[2]]
    res = g.query("MATCH (a)-[r:R {w: 6}]->(b) RETURN b.n")
    assert res.result_set == []


def test_multi_edge_between_same_pair(g):
    g.query("CREATE (a:M {n:1}), (b:M {n:2})")
    g.query("MATCH (a:M {n:1}), (b:M {n:2}) "
            "CREATE (a)-[:R {k:1}]->(b), (a)-[:R {k:2}]->(b)")
    res = g.query("MATCH (:M {n:1})-[r:R]->(:M {n:2}) RETURN r.k ORDER BY r.k")
    assert [r[0] for r in res.result_set] == [1, 2]


def test_unwind_aggregate(g):
    res = g.query("UNWIND [1,2,3,4] AS x RETURN sum(x), count(x), avg(x), "
                  "min(x), max(x), collect(x)")
    assert res.result_set == [[10, 4, 2.5, 1, 4, [1, 2, 3, 4]]]


def test_group_by(g):
    g.query("UNWIND [['a',1],['a',2],['b',5]] AS p "
            "CREATE (:G {k: p[0], v: p[1]})")
    res = g.query("MATCH (n:G) RETURN n.k, sum(n.v) ORDER BY n.k")
    assert res.result_set == [["a", 3], ["b", 5]]


def test_with_chain(g):
    g.query("UNWIND range(1,5) AS i CREATE (:W {v:i})")
    res = g.query("MATCH (n:W) WITH n.v AS v WHERE v > 2 "
                  "RETURN v ORDER BY v LIMIT 2")
    assert [r[0] for r in res.result_set] == [3, 4]


def test_distinct_skip_limit(g):
    g.query("UNWIND [1,1,2,2,3] AS x CREATE (:D {v:x})")
    res = g.query("MATCH (n:D) RETURN DISTINCT n.v ORDER BY n.v")
    assert [r[0] for r in res.result_set] == [1, 2, 3]
    res = g.query("MATCH (n:D) RETURN DISTINCT n.v ORDER BY n.v SKIP 1 LIMIT 1")
    assert [r[0] for r in res.result_set] == [2]


def test_optional_match(g):
    g.query("CREATE (:O {n:1})-[:R]->(:O {n:2}), (:O {n:3})")
    res = g.query("MATCH (a:O) OPTIONAL MATCH (a)-[:R]->(b) "
                  "RETURN a.n, b.n ORDER BY a.n")
    assert res.result_set == [[1, 2], [2, None], [3, None]]


def test_set_remove(g):
    g.query("CREATE (:S {v:1})")
    r = g.query("MATCH (n:S) SET n.v = 2, n.w = 'x' RETURN n.v, n.w")
    assert r.result_set == [[2, "x"]]
    assert r.properties_set == 2
    r = g.query("MATCH (n:S) REMOVE n.w RETURN n.w")
    assert r.result_set == [[None]]
    r = g.query("MATCH (n:S) SET n:Extra RETURN labels(n)")
    assert sorted(r.result_set[0][0]) == ["Extra", "S"]


def test_delete(g):
    g.query("CREATE (:Del {v:1})-[:R]->(:Del {v:2})")
    with pytest.raises(Exception):
        g.query("MATCH (n:Del {v:1}) DELETE n")  # has relationships
    r = g.query("MATCH (n:Del {v:1}) DETACH DELETE n")
    assert r.nodes_deleted == 1 and r.relationships_deleted == 1
    assert len(g.query("MATCH (n:Del) RETURN n").result_set) == 1


def test_merge(g):
    r1 = g.query("MERGE (n:Mg {k: 'a'}) RETURN n")
    assert r1.nodes_created == 1
    r2 = g.query("MERGE (n:Mg {k: 'a'}) RETURN n")
    assert r2.nodes_created == 0
    assert len(g.query("MATCH (n:Mg) RETURN n").result_set) == 1


def test_merge_on_create_on_match(g):
    g.query("MERGE (n:Mc {k:1}) ON CREATE SET n.created = true "
            "ON MATCH SET n.matched = true")
    r = g.query("MATCH (n:Mc) RETURN n.created, n.matched")
    assert r.result_set == [[True, None]]
    g.query("MERGE (n:Mc {k:1}) ON CREATE SET n.created2 = true "
            "ON MATCH SET n.matched = true")
    r = g.query("MATCH (n:Mc) RETURN n.created2, n.matched")
    assert r.result_set == [[None, True]]


def test_merge_relationship(g):
    g.query("CREATE (:Mr {n:1}), (:Mr {n:2})")
    r = g.query("MATCH (a:Mr {n:1}), (b:Mr {n:2}) MERGE (a)-[:R]->(b)")
    assert r.relationships_created == 1
    r = g.query("MATCH (a:Mr {n:1}), (b:Mr {n:2}) MERGE (a)-[:R]->(b)")
    assert r.relationships_created == 0


def test_var_length(g):
    g.query("CREATE (a:V {n:1})-[:R]->(b:V {n:2})-[:R]->(c:V {n:3})"
            "-[:R]->(d:V {n:4})")
    res = g.query("MATCH (a:V {n:1})-[:R*2..3]->(x) RETURN x.n ORDER BY x.n")
    assert [r[0] for r in res.result_set] == [3, 4]
    res = g.query("MATCH (a:V {n:1})-[:R*]->(x) RETURN count(x)")
    assert res.result_set == [[3]]


def test_named_path(g):
    g.query("CREATE (:Pp {n:1})-[:R]->(:Pp {n:2})")
    res = g.query("MATCH p = (:Pp {n:1})-[:R]->(:Pp) RETURN length(p), nodes(p)")
    row = res.result_set[0]
    assert row[0] == 1
    assert [n.properties["n"] for n in row[1]] == [1, 2]


def test_union(g):
    res = g.query("RETURN 1 AS x UNION RETURN 1 AS x UNION RETURN 2 AS x")
    assert sorted(r[0] for r in res.result_set) == [1, 2]
    res = g.query("RETURN 1 AS x UNION ALL RETURN 1 AS x")
    assert [r[0] for r in res.result_set] == [1, 1]


def test_order_desc(g):
    res = g.query("UNWIND [3,1,2] AS x RETURN x ORDER BY x DESC")
    assert [r[0] for r in res.result_set] == [3, 2, 1]


def test_functions_e2e(g):
    res = g.query("RETURN toUpper('ab'), size('abc'), abs(-3), "
                  "coalesce(null, 'd'), split('a,b', ',')")
    assert res.result_set == [["AB", 3, 3, "d", ["a", "b"]]]


def test_null_semantics(g):
    res = g.query("RETURN null = null, null <> null, null IS NULL, "
                  "1 + null, coalesce(null, 2)")
    assert res.result_set == [[None, None, True, None, 2]]


def test_parameters(g):
    res = g.query("RETURN $a + 1 AS x", params={"a": 41})
    assert res.result_set == [[42]]
    g.query("CREATE (:Par {v: $v})", params={"v": "hello"})
    res = g.query("MATCH (n:Par) WHERE n.v = $v RETURN n.v",
                  params={"v": "hello"})
    assert res.result_set == [["hello"]]


def test_case_expression(g):
    res = g.query("UNWIND [1,2,3] AS x RETURN CASE WHEN x < 2 THEN 'lo' "
                  "WHEN x < 3 THEN 'mid' ELSE 'hi' END")
    assert [r[0] for r in res.result_set] == ["lo", "mid", "hi"]


def test_list_comprehension(g):
    res = g.query("RETURN [x IN range(1, 5) WHERE x % 2 = 1 | x * 10] AS l")
    assert res.result_set == [[[10, 30, 50]]]


def test_exists_pattern(g):
    g.query("CREATE (:Ex {n:1})-[:R]->(:Ex {n:2}), (:Ex {n:3})")
    res = g.query("MATCH (a:Ex) WHERE EXISTS((a)-[:R]->()) RETURN a.n")
    assert [r[0] for r in res.result_set] == [1]


def test_count_star(g):
    g.query("CREATE (:Cs), (:Cs), (:Cs)")
    res = g.query("MATCH (n:Cs) RETURN count(*)")
    assert res.result_set == [[3]]


def test_procedures(g):
    g.query("CREATE (:L1)-[:T1]->(:L2 {p: 1})")
    labels = {r[0] for r in g.query("CALL db.labels()").result_set}
    assert labels == {"L1", "L2"}
    rels = {r[0] for r in g.query("CALL db.relationshipTypes()").result_set}
    assert rels == {"T1"}
    res = g.query("CALL db.meta.stats() YIELD nodeCount RETURN nodeCount")
    assert res.result_set == [[2]]


def test_foreach(g):
    g.query("FOREACH (x IN [1,2,3] | CREATE (:F {v: x}))")
    res = g.query("MATCH (n:F) RETURN count(n)")
    assert res.result_set == [[3]]


def test_cartesian_product(g):
    g.query("CREATE (:Ca {n:1}), (:Ca {n:2})")
    res = g.query("MATCH (a:Ca), (b:Ca) RETURN a.n, b.n ORDER BY a.n, b.n")
    assert len(res.result_set) == 4


def test_explain_profile(g):
    g.query("CREATE (:Ep)")
    plan = g.explain("MATCH (n:Ep) RETURN n")
    assert "Node By Label Scan" in plan
    res = g.query("PROFILE MATCH (n:Ep) RETURN n")
    assert res.profile is not None and "Records produced" in res.profile


def test_expand_into(g):
    g.query("CREATE (a:Ei {n:1})-[:R]->(b:Ei {n:2})")
    res = g.query("MATCH (a:Ei {n:1}), (b:Ei {n:2}) "
                  "MATCH (a)-[:R]->(b) RETURN a.n, b.n")
    assert res.result_set == [[1, 2]]


def test_timeout(g):
    g.query("UNWIND range(1, 2000) AS i CREATE (:T {v: i})")
    from falkordb_tpu.runtime.ops import QueryTimeout

    with pytest.raises(Exception):
        g.query("MATCH (a:T), (b:T), (c:T) RETURN count(*)", timeout=1)


def test_id_function_and_seek(g):
    r = g.query("CREATE (n:IdT {x: 1}) RETURN id(n)")
    nid = r.result_set[0][0]
    res = g.query(f"MATCH (n) WHERE id(n) = {nid} RETURN n.x")
    assert res.result_set == [[1]]


def test_varlen_edge_props_filter(g):
    g.query("CREATE (a:Vp {k:1})-[:R {w:1}]->(b:Vp {k:2})-[:R {w:2}]->"
            "(c:Vp {k:3})")
    g.query("MATCH (a:Vp {k:1}), (c:Vp {k:3}) "
            "CREATE (a)-[:R {w:1}]->(:Vp {k:4})-[:R {w:1}]->(c)")
    # every hop must carry w=1 (absorb_edge_filters_into_vlt semantics)
    r = g.query("MATCH (:Vp {k:1})-[:R*2 {w:1}]->(x) RETURN x.k")
    assert r.result_set == [[3]]


def test_inline_param_props(g):
    g.query("CREATE (:Pm {a: 1, b: 'x'})")
    r = g.query("MATCH (n:Pm {a: $m.a}) RETURN n.b", params={"m": {"a": 1}})
    assert r.result_set == [["x"]]


def test_batched_detach_delete_semantics():
    """r5: multi-node deletes sweep incident edges in ONE pass — the
    plain-DELETE error on connected nodes and diff-counters must hold."""
    g = FalkorDB().select_graph("bulk_del")
    g.query("UNWIND range(0, 49) AS i CREATE (:D {id: i})")
    g.query("MATCH (a:D), (b:D) WHERE a.id < 5 AND b.id >= 45 "
            "CREATE (a)-[:R]->(b)")
    with pytest.raises(Exception):
        g.query("MATCH (d:D) WHERE d.id < 5 DELETE d")
    r = g.query("MATCH (d:D) WHERE d.id < 5 DETACH DELETE d")
    assert r.stats["nodes_deleted"] == 5
    assert r.stats["relationships_deleted"] == 25
    assert g.query("MATCH (d:D) RETURN count(d)").result_set == [[45]]
    assert g.query("MATCH ()-[r:R]->() RETURN count(r)").result_set == [[0]]
    # unconnected plain DELETE through the batched path
    r2 = g.query("MATCH (d:D) WHERE d.id >= 40 DELETE d")
    assert r2.stats["nodes_deleted"] == 10
