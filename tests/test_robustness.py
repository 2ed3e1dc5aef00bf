"""Robustness: malformed/hostile inputs must raise clean errors, never
crash or corrupt state (the reference's fuzz-target role,
fuzz/fuzz_targets/fuzz_target_runtime.rs)."""

import pytest

from falkordb_tpu import FalkorDB

BAD_QUERIES = [
    "",
    "   ",
    "MATCH",
    "MATCH (",
    "MATCH (n RETURN n",
    "MATCH (n) RETURN",
    "RETURN 1 +",
    "CREATE (n:)",
    "CREATE (n {)",
    "MATCH (a)-[>(b) RETURN a",
    "MATCH (a)-[:]->(b) RETURN a",
    "UNWIND AS x RETURN x",
    "WITH RETURN 1",
    "RETURN $",
    "RETURN 'unterminated",
    "RETURN /* unterminated",
    "MATCH (n) WHERE RETURN n",
    "RETURN 1 AS",
    "MATCH (n) SET n. = 1",
    "MATCH (n) DELETE",
    "FOREACH (x IN [1] | RETURN x)",  # RETURN not an update clause
    "CALL nosuch.proc() YIELD x RETURN x",
    "MATCH (n) RETURN m",
    "RETURN nosuchfn(1)",
    "CREATE (a)-[:R]->(b)-[:R]-(c)",  # undirected CREATE
    "MERGE (a)-[r:R*]->(b)",
    "RETURN [x IN 5 | x]",
    "RETURN {a: }",
    "RETURN (1",
    "MATCH (n) RETURN n ORDER BY SKIP 1",
    "CYPHER =1 RETURN 1",
    "RETURN 1; RETURN 2; garbage",
]


def test_bad_queries_raise_cleanly():
    g = FalkorDB().select_graph("fz")
    g.query("CREATE (:Seed {v: 1})")
    for q in BAD_QUERIES:
        with pytest.raises(Exception) as ei:
            g.query(q)
        assert not isinstance(ei.value, (SystemExit, KeyboardInterrupt,
                                         MemoryError)), q
    # state intact after the barrage
    assert g.query("MATCH (n:Seed) RETURN n.v").result_set == [[1]]


def test_type_errors_surface():
    g = FalkorDB().select_graph("fz2")
    for q in [
        "RETURN 1 + [1]",
        "RETURN size(5)",
        "RETURN toUpper(5)",
        "RETURN abs('x')",
        "RETURN 1 AND true",
        "UNWIND 5 AS x RETURN x",  # non-list unwind → single row, fine
    ]:
        try:
            g.query(q)
        except Exception as e:
            assert "Error" in type(e).__name__ or isinstance(e, ValueError), q


def test_deep_nesting_does_not_crash():
    g = FalkorDB().select_graph("fz3")
    expr = "1"
    for _ in range(200):
        expr = f"({expr} + 1)"
    r = g.query(f"RETURN {expr}")
    assert r.result_set == [[201]]


def test_unicode_and_escapes():
    g = FalkorDB().select_graph("fz4")
    r = g.query("CREATE (n:Émoji {s: '☺ \\' \" \\\\ tab\\t'}) RETURN n.s")
    assert r.result_set[0][0] == "☺ ' \" \\ tab\t"
    r = g.query("MATCH (n:Émoji) RETURN labels(n)")
    assert r.result_set == [[["Émoji"]]]


def test_huge_literal_list():
    g = FalkorDB().select_graph("fz5")
    r = g.query("RETURN size(range(1, 100000))")
    assert r.result_set == [[100000]]


def test_empty_graph_queries():
    g = FalkorDB().select_graph("fz6")
    assert g.query("MATCH (n) RETURN n").result_set == []
    assert g.query("MATCH (n)-[r]->(m) RETURN r").result_set == []
    assert g.query("MATCH (n:NoLabel) RETURN count(n)").result_set == [[0]]
    assert g.query("MATCH (n) DETACH DELETE n").nodes_deleted == 0
    r = g.query("CALL algo.pageRank(null, null) YIELD node RETURN node")
    assert r.result_set == []
