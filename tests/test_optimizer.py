"""Optimizer pass tests: plan-shape assertions (the reference's
execution_plan_util.py pattern, SURVEY.md §4 fixtures)."""

import pytest

from falkordb_tpu import FalkorDB


@pytest.fixture
def g():
    return FalkorDB().select_graph("opt")


def test_reduce_count_node(g):
    g.query("UNWIND range(1,5) AS i CREATE (:C {v:i}), (:D {v:i})")
    plan = g.explain("MATCH (n) RETURN count(n)")
    assert "count from metadata" in plan
    assert g.query("MATCH (n) RETURN count(n)").result_set == [[10]]
    plan = g.explain("MATCH (n:C) RETURN count(*)")
    assert "count from metadata" in plan
    assert g.query("MATCH (n:C) RETURN count(*)").result_set == [[5]]
    # with a WHERE it must NOT reduce
    plan = g.explain("MATCH (n:C) WHERE n.v > 1 RETURN count(*)")
    assert "count from metadata" not in plan
    assert g.query("MATCH (n:C) WHERE n.v > 1 RETURN count(*)").result_set == [[4]]


def test_node_by_id_seek(g):
    r = g.query("CREATE (n:S {x: 9}) RETURN id(n)")
    nid = r.result_set[0][0]
    plan = g.explain(f"MATCH (n) WHERE id(n) = {nid} RETURN n.x")
    assert "Node By Id Seek" in plan
    assert g.query(f"MATCH (n) WHERE id(n) = {nid} RETURN n.x").result_set == [[9]]
    # IN list form
    plan = g.explain(f"MATCH (n) WHERE id(n) IN [{nid}] RETURN n.x")
    assert "Node By Id Seek" in plan


def test_index_scan_utilization(g):
    g.query("UNWIND range(1, 100) AS i CREATE (:P {age: i})")
    g.query("CREATE INDEX FOR (p:P) ON (p.age)")
    plan = g.explain("MATCH (p:P) WHERE p.age > 90 RETURN p.age")
    assert "Index Scan" in plan
    res = g.query("MATCH (p:P) WHERE p.age > 90 RETURN p.age ORDER BY p.age")
    assert [r[0] for r in res.result_set] == list(range(91, 101))
    # range both sides
    res = g.query("MATCH (p:P) WHERE p.age >= 5 AND p.age < 8 "
                  "RETURN p.age ORDER BY p.age")
    assert [r[0] for r in res.result_set] == [5, 6, 7]
    # equality
    plan = g.explain("MATCH (p:P) WHERE p.age = 42 RETURN p")
    assert "Index Scan" in plan
    assert len(g.query("MATCH (p:P) WHERE p.age = 42 RETURN p").result_set) == 1
    # unindexed label unaffected
    plan = g.explain("MATCH (q:Q) WHERE q.age > 90 RETURN q")
    assert "Index Scan" not in plan


def test_index_updates_after_write(g):
    g.query("CREATE INDEX FOR (n:W) ON (n.v)")
    g.query("CREATE (:W {v: 5})")
    assert len(g.query("MATCH (n:W) WHERE n.v = 5 RETURN n").result_set) == 1
    g.query("MATCH (n:W {v: 5}) SET n.v = 6")
    assert len(g.query("MATCH (n:W) WHERE n.v = 5 RETURN n").result_set) == 0
    assert len(g.query("MATCH (n:W) WHERE n.v = 6 RETURN n").result_set) == 1


def test_filter_pushdown_between_paths(g):
    g.query("CREATE (:A1 {v:1})-[:R]->(:B1 {w:1}), (:A1 {v:2})-[:R]->(:B1 {w:2})")
    # filter on a alone must come before the second path's cartesian source
    plan = g.explain("MATCH (a:A1), (b:B1) WHERE a.v = 1 AND b.w = 2 "
                     "RETURN a.v, b.w")
    lines = plan.split("\n")
    res = g.query("MATCH (a:A1), (b:B1) WHERE a.v = 1 AND b.w = 2 "
                  "RETURN a.v, b.w")
    assert res.result_set == [[1, 2]]


def test_hash_join_replaces_cartesian(g):
    g.query("UNWIND range(1, 30) AS i CREATE (:L {v: i}), (:R {w: i})")
    q = ("MATCH (a:L), (b:R) WHERE a.v = b.w AND a.v <= 3 "
         "RETURN a.v, b.w ORDER BY a.v")
    plan = g.explain(q)
    assert "Value Hash Join" in plan
    assert "Cartesian" not in plan
    res = g.query(q)
    assert res.result_set == [[1, 1], [2, 2], [3, 3]]
    # no equality → stays a product
    plan2 = g.explain("MATCH (a:L), (b:R) WHERE a.v < b.w RETURN count(*)")
    assert "Value Hash Join" not in plan2
    r = g.query("MATCH (a:L), (b:R) WHERE a.v < b.w RETURN count(*)")
    assert r.result_set == [[435]]  # 30*29/2


def test_hash_join_on_expressions(g):
    g.query("UNWIND range(1, 10) AS i CREATE (:X {v: i}), (:Y {w: i * 2})")
    q = "MATCH (a:X), (b:Y) WHERE a.v * 2 = b.w RETURN count(*)"
    assert "Value Hash Join" in g.explain(q)
    assert g.query(q).result_set == [[10]]


def test_string_index_range(g):
    g.query("UNWIND ['ann','bob','carl'] AS n CREATE (:Nm {name: n})")
    g.query("CREATE INDEX FOR (x:Nm) ON (x.name)")
    res = g.query("MATCH (x:Nm) WHERE x.name = 'bob' RETURN x.name")
    assert res.result_set == [["bob"]]


def test_fuse_anonymous_traverse(g):
    # a -> m1 -> b ; a -> m2 -> c ; plus a direct a -> b edge (1 hop only)
    g.query("CREATE (a:FA {n:'a'})-[:R]->(:FM)-[:R]->(b:FB {n:'b'}), "
            "(a)-[:R]->(:FM)-[:R]->(c:FB {n:'c'}), (a)-[:R]->(b)")
    plan = g.explain("MATCH (a:FA)-->()-->(b:FB) RETURN b.n")
    # one fused traverse op, not two
    assert plan.count("Conditional Traverse") == 1
    assert "()" in plan
    res = g.query("MATCH (a:FA)-->()-->(b:FB) RETURN b.n ORDER BY b.n")
    assert res.result_set == [["b"], ["c"]]
    # path-multiplicity semantics: two parallel 2-hop routes are TWO
    # matches — anonymous intermediates still distinguish bindings
    # (openCypher counts paths; r4 fix of the distinct-pair collapse)
    g.query("CREATE (x:FX)-[:R]->(:FM2)-[:R]->(y:FY), "
            "(x)-[:R]->(:FM2)-[:R]->(y)")
    res = g.query("MATCH (x:FX)-->()-->(y:FY) RETURN count(*)")
    assert res.result_set == [[2]]
    # intermediate label constraint survives fusion
    res = g.query("MATCH (a:FA)-->(:FM)-->(b) RETURN b.n ORDER BY b.n")
    assert res.result_set == [["b"], ["c"]]
    # 3-hop chain
    g.query("CREATE (:F3 {n:'s'})-[:R]->(:FM3)-[:R]->(:FM3)-[:R]->(:F3 {n:'t'})")
    plan = g.explain("MATCH (s:F3)-->()-->()-->(t:F3) RETURN t.n")
    assert plan.count("Conditional Traverse") == 1
    res = g.query("MATCH (s:F3)-->()-->()-->(t:F3) RETURN t.n")
    assert res.result_set == [["t"]]


def test_no_fuse_when_intermediate_bound(g):
    g.query("CREATE (a:NF {n:'a'})-[:R]->(m:NFM {k:1})-[:R]->(b:NF {n:'b'})")
    # named intermediate: must NOT fuse (m is projected)
    plan = g.explain("MATCH (a:NF)-->(m)-->(b:NF) RETURN m.k")
    assert plan.count("Conditional Traverse") == 2
    assert g.query("MATCH (a:NF)-->(m)-->(b:NF) RETURN m.k").result_set == [[1]]
    # named edge: must NOT fuse
    plan = g.explain("MATCH (a:NF)-[r]->()-->(b:NF) RETURN type(r)")
    assert plan.count("Conditional Traverse") == 2
    # inline props on intermediate: must NOT fuse
    plan = g.explain("MATCH (a:NF)-->({k:1})-->(b:NF) RETURN b.n")
    assert plan.count("Conditional Traverse") == 2
    assert g.query("MATCH (a:NF)-->({k:1})-->(b:NF) RETURN b.n").result_set == [["b"]]
    # named path: must NOT fuse (all elements addressable)
    plan = g.explain("MATCH p = (a:NF)-->()-->(b:NF) RETURN length(p)")
    assert plan.count("Conditional Traverse") == 2
    assert g.query("MATCH p = (a:NF)-->()-->(b:NF) RETURN length(p)").result_set == [[2]]


def test_fuse_optional_traverse(g):
    g.query("CREATE (a:OU {n:'a'})-[:OF]->(b:OU {n:'b'}), (:OU {n:'c'})")
    plan = g.explain("MATCH (u:OU) OPTIONAL MATCH (u)-[f:OF]->(v) RETURN u.n, v.n")
    assert "Optional Conditional Traverse" in plan
    assert "Optional Match" not in plan
    r = g.query("MATCH (u:OU) OPTIONAL MATCH (u)-[f:OF]->(v) "
                "RETURN u.n, v.n, type(f) ORDER BY u.n")
    assert r.result_set == [['a', 'b', 'OF'], ['b', None, None],
                            ['c', None, None]]
    # reversed bound side fuses too
    r = g.query("MATCH (u:OU) OPTIONAL MATCH (w)-[:OF]->(u) "
                "RETURN u.n, w.n ORDER BY u.n")
    assert r.result_set == [['a', None], ['b', 'a'], ['c', None]]
    # WHERE keeps the general operator
    plan = g.explain("MATCH (u:OU) OPTIONAL MATCH (u)-[:OF]->(v) "
                     "WHERE v.n = 'b' RETURN u.n, v.n")
    assert "Optional Match" in plan
    # dst labels survive fusion
    g.query("CREATE (x:OX)-[:OF]->(:OY), (x)-[:OF]->(:OZ)")
    r = g.query("MATCH (x:OX) OPTIONAL MATCH (x)-[:OF]->(y:OY) RETURN count(y)")
    assert r.result_set == [[1]]


def test_eliminate_true_filters(g):
    g.query("CREATE (:ET {v:1}), (:ET {v:2})")
    assert "Filter" not in g.explain("MATCH (n:ET) WHERE true RETURN n.v")
    assert "Filter" not in g.explain("MATCH (n:ET) WHERE 1 = 1 RETURN n.v")
    p = g.explain("MATCH (n:ET) WHERE true AND n.v > 1 RETURN n.v")
    assert p.count("Filter") == 1
    assert g.query("MATCH (n:ET) WHERE true AND n.v > 1 RETURN n.v").result_set == [[2]]
    # constant-false must NOT be eliminated
    assert g.query("MATCH (n:ET) WHERE false RETURN n.v").result_set == []


def test_reduce_var_len_path(g):
    """Unused named var-length aliases skip edge-list materialization."""
    import falkordb_tpu.runtime.ops as O
    from falkordb_tpu.lang.parser import parse
    from falkordb_tpu.lang.planner import plan_query

    def vlt_edge_slots(qtext):
        pq = plan_query(parse(qtext))
        out, stack = [], [pq.root]
        while stack:
            op = stack.pop()
            stack.extend(op.children())
            if isinstance(op, O.VarLenTraverse):
                out.append(op.edge_slot)
        return out

    assert vlt_edge_slots("MATCH (a)-[r:E*1..2]->(b) RETURN b") == [None]
    assert vlt_edge_slots("MATCH (a)-[r:E*1..2]->(b) RETURN r") != [None]
    assert vlt_edge_slots(
        "MATCH (a)-[r:E*1..2]->(b) WHERE size(r) > 1 RETURN b") != [None]
    assert vlt_edge_slots(
        "MATCH (a)-[r:E*1..2]->(b) WITH r, b RETURN b") != [None]
    # results unchanged either way
    g.query("CREATE (:RV {n:1})-[:E]->(:RV {n:2})-[:E]->(:RV {n:3})")
    r = g.query("MATCH (a:RV {n:1})-[r:E*1..2]->(b) RETURN b.n ORDER BY b.n")
    assert r.result_set == [[2], [3]]


def test_reorder_labels_cheapest_first():
    """reorder_labels (reference planner/optimizer/reorder_labels.rs,
    extended with cardinality ordering): a multi-label scan must run over
    the cheapest label regardless of the order written in the pattern."""
    from falkordb_tpu import FalkorDB

    g = FalkorDB().select_graph("reorder_labels")
    g.query("UNWIND range(0, 99) AS i CREATE (:Big {id: i})")
    g.query("UNWIND range(0, 2) AS i CREATE (:Big:Small {id: 1000 + i})")
    for q in ("MATCH (n:Big:Small) RETURN n.id",
              "MATCH (n:Small:Big) RETURN n.id"):
        plan = g.explain(q)
        assert "Node By Label Scan | (n:Small)" in plan, plan
        assert sorted(r[0] for r in g.query(q).result_set) == \
            [1000, 1001, 1002]
    # unknown label sorts last (never chosen over a known one)
    plan = g.explain("MATCH (n:Missing:Small) RETURN n")
    assert "Node By Label Scan | (n:Small)" in plan, plan


def test_index_seek_with_upstream_bound_value():
    """Dynamic seek values: the index pass accepts exprs whose vars are
    bound upstream (UNWIND/WITH), evaluated per driving row — the
    reference's utilize_index with runtime values."""
    from falkordb_tpu import FalkorDB

    g = FalkorDB().select_graph("opt_dynseek")
    g.query("UNWIND range(0, 99) AS i CREATE (:P {id: i})")
    g.query("CREATE INDEX FOR (p:P) ON (p.id)")
    q = "UNWIND [3, 7] AS i MATCH (p:P {id: i}) RETURN p.id ORDER BY p.id"
    assert "Index Scan" in g.explain(q)
    assert g.query(q).result_set == [[3], [7]]
    q2 = ("UNWIND [10, 50] AS lo MATCH (p:P) "
          "WHERE p.id >= lo AND p.id < lo + 2 RETURN p.id ORDER BY p.id")
    assert "Index Scan" in g.explain(q2)
    assert g.query(q2).result_set == [[10], [11], [50], [51]]


def test_fused_chain_path_semantics(g):
    """The fused chain must preserve openCypher match semantics:
    multiplicity over shared intermediates, parallel-edge bindings, and
    per-pattern edge uniqueness on undirected hops (r4 regression —
    the structural product had collapsed distinct (row,dst) pairs)."""
    # diamond: s->m1->t, s->m2->t — two matches
    g.query("CREATE (s:PS)-[:R]->(:PM)-[:R]->(t:PT), "
            "(s)-[:R]->(:PM)-[:R]->(t)")
    assert g.query("MATCH (:PS)-->()-->(:PT) RETURN count(*)"
                   ).result_set == [[2]]
    # parallel edges on the first hop double the paths
    g.query("CREATE (a:PA)-[:R]->(m:PMM)-[:R]->(c:PC) "
            "CREATE (a)-[:R]->(m)")
    assert g.query("MATCH (:PA)-[:R]->()-[:R]->(:PC) RETURN count(*)"
                   ).result_set == [[2]]
    # undirected chain cannot reuse the single edge back
    g.query("CREATE (:PU)-[:R]->(:PV)")
    assert g.query("MATCH (u:PU)-[:R]-()-[:R]-(w) RETURN count(w)"
                   ).result_set == [[0]]
