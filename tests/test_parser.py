"""L5' parser tests over the openCypher grammar surface the reference covers
(graph/src/parser/cypher.rs:37-60)."""

import pytest

from falkordb_tpu.lang import parse
from falkordb_tpu.lang import ast as A
from falkordb_tpu.lang.parser import ParseError


def test_simple_match_return():
    q = parse("MATCH (r:Rider)-[:rides]->(t:Team) WHERE t.name = 'Yamaha' "
              "RETURN r.name")
    m, r = q.clauses
    assert isinstance(m, A.MatchClause) and not m.optional
    path = m.paths[0]
    n0, rel, n1 = path.elements
    assert n0.var == "r" and n0.labels == ["Rider"]
    assert rel.types == ["rides"] and rel.direction == "out"
    assert n1.var == "t" and n1.labels == ["Team"]
    assert isinstance(m.where, A.Binary) and m.where.op == "="
    assert isinstance(r, A.ReturnClause)
    assert isinstance(r.items[0].expr, A.Prop)


def test_create_with_props():
    q = parse("CREATE (a:Person {name:'Al', age: 30})-[:KNOWS {since:2020}]->"
              "(b:Person)")
    c = q.clauses[0]
    assert isinstance(c, A.CreateClause)
    n0, rel, n1 = c.paths[0].elements
    assert dict((k, v.value) for k, v in n0.props.items) == {"name": "Al", "age": 30}
    assert rel.props.items[0][0] == "since"


def test_var_length():
    q = parse("MATCH (a)-[r:KNOWS*2..4]->(b) RETURN b")
    rel = q.clauses[0].paths[0].elements[1]
    assert rel.varlen and rel.min_hops == 2 and rel.max_hops == 4
    rel2 = parse("MATCH (a)-[*]->(b) RETURN b").clauses[0].paths[0].elements[1]
    assert rel2.varlen and rel2.min_hops == 1 and rel2.max_hops is None
    rel3 = parse("MATCH (a)-[*3]->(b) RETURN b").clauses[0].paths[0].elements[1]
    assert rel3.min_hops == 3 and rel3.max_hops == 3


def test_direction():
    rel = parse("MATCH (a)<-[:T]-(b) RETURN a").clauses[0].paths[0].elements[1]
    assert rel.direction == "in"
    rel = parse("MATCH (a)-[:T]-(b) RETURN a").clauses[0].paths[0].elements[1]
    assert rel.direction == "both"


def test_multi_types_and_paths():
    q = parse("MATCH p = (a)-[:X|Y|:Z]->(b), (c) RETURN p")
    path = q.clauses[0].paths[0]
    assert path.var == "p"
    assert path.elements[1].types == ["X", "Y", "Z"]
    assert len(q.clauses[0].paths) == 2


def test_optional_match_where():
    q = parse("MATCH (a) OPTIONAL MATCH (a)-[:R]->(b) WHERE b.x > 1 RETURN a, b")
    assert not q.clauses[0].optional
    assert q.clauses[1].optional
    assert q.clauses[1].where is not None


def test_with_aggregation_order():
    q = parse("MATCH (a) WITH a.city AS city, count(*) AS cnt "
              "ORDER BY cnt DESC SKIP 1 LIMIT 5 WHERE cnt > 2 RETURN city")
    w = q.clauses[1]
    assert isinstance(w, A.WithClause)
    assert w.items[0].alias == "city"
    assert isinstance(w.items[1].expr, A.CountStar)
    assert w.order_by[0][1] is False
    assert w.skip.value == 1 and w.limit.value == 5
    assert w.where is not None


def test_merge_on_create_on_match():
    q = parse("MERGE (a:P {k:1}) ON CREATE SET a.c = 1 ON MATCH SET a.m = 2")
    m = q.clauses[0]
    assert isinstance(m, A.MergeClause)
    assert m.on_create[0].target.key == "c"
    assert m.on_match[0].target.key == "m"


def test_delete_set_remove():
    q = parse("MATCH (a) DETACH DELETE a")
    assert q.clauses[1].detach
    q = parse("MATCH (a) SET a.x = 1, a += {y: 2}, a:Label")
    items = q.clauses[1].items
    assert items[0].op == "=" and items[1].op == "+=" and items[2].op == "label"
    q = parse("MATCH (a) REMOVE a.x, a:L")
    assert q.clauses[1].items[0].op == "remove_prop"
    assert q.clauses[1].items[1].op == "remove_label"


def test_unwind_union():
    q = parse("UNWIND [1,2,3] AS x RETURN x UNION ALL RETURN 4 AS x")
    assert isinstance(q.clauses[0], A.UnwindClause)
    assert q.union_all and q.union_with is not None


def test_call_procedure():
    q = parse("CALL db.labels() YIELD label RETURN label")
    c = q.clauses[0]
    assert c.proc == "db.labels" and c.yields == [("label", None)]
    q = parse("CALL algo.pageRank('Person', 'KNOWS') YIELD node, score "
              "RETURN node ORDER BY score DESC")
    assert q.clauses[0].proc == "algo.pageRank".lower() or q.clauses[0].proc == "algo.pagerank"


def test_call_subquery():
    q = parse("CALL { MATCH (n) RETURN n } RETURN n")
    assert isinstance(q.clauses[0], A.CallSubquery)


def test_foreach():
    q = parse("FOREACH (x IN [1,2] | CREATE (:N {v: x}))")
    f = q.clauses[0]
    assert isinstance(f, A.ForeachClause) and f.var == "x"
    assert isinstance(f.updates[0], A.CreateClause)


def test_expressions():
    q = parse("RETURN 1 + 2 * 3 ^ 2 AS a, -4 % 3 AS b, 'x' + 'y' AS c")
    assert len(q.clauses[0].items) == 3
    q = parse("RETURN [1,2,3][0..2] AS s, {a: 1}.a AS m, $p AS p")
    assert isinstance(q.clauses[0].items[0].expr, A.Slice)
    q = parse("RETURN CASE WHEN 1 > 0 THEN 'y' ELSE 'n' END AS r")
    assert isinstance(q.clauses[0].items[0].expr, A.Case)
    q = parse("RETURN [x IN range(1,5) WHERE x % 2 = 0 | x * 10] AS l")
    lc = q.clauses[0].items[0].expr
    assert isinstance(lc, A.ListComp) and lc.where is not None
    q = parse("RETURN reduce(s = 0, x IN [1,2,3] | s + x) AS total")
    assert isinstance(q.clauses[0].items[0].expr, A.Reduce)
    q = parse("MATCH (n) WHERE n.name STARTS WITH 'A' AND n.name =~ '.*x' RETURN n")
    assert q.clauses[0].where.op == "AND"
    q = parse("MATCH (n) WHERE any(x IN n.list WHERE x = 1) RETURN n")
    assert isinstance(q.clauses[0].where, A.Quantifier)


def test_null_and_labels_predicate():
    q = parse("MATCH (n) WHERE n.x IS NOT NULL AND n:Person RETURN n")
    w = q.clauses[0].where
    assert w.op == "AND"
    assert isinstance(w.left, A.IsNull) and w.left.negated
    assert isinstance(w.right, A.FnCall) and w.right.name == "haslabels"


def test_exists():
    q = parse("MATCH (n) WHERE EXISTS(n.x) RETURN n")
    assert q.clauses[0].where.prop is not None
    q = parse("MATCH (n) WHERE EXISTS((n)-[:R]->()) RETURN n")
    assert q.clauses[0].where.pattern is not None


def test_chained_comparison():
    q = parse("RETURN 1 < 2 < 3 AS t")
    e = q.clauses[0].items[0].expr
    assert e.op == "AND"


def test_cypher_params_prefix():
    q = parse("CYPHER a=1 b='x' MATCH (n {k: $a}) RETURN n")
    assert q.params == {"a": 1, "b": "x"}


def test_index_ddl():
    q = parse("CREATE INDEX FOR (n:Person) ON (n.age)")
    c = q.clauses[0]
    assert isinstance(c, A.CreateIndexClause)
    assert c.kind == "range" and c.entity == "node"
    assert c.label == "Person" and c.props == ["age"]
    q = parse("CREATE INDEX FOR ()-[r:KNOWS]-() ON (r.since)")
    assert q.clauses[0].entity == "edge"
    q = parse("DROP INDEX FOR (n:Person) ON (n.age)")
    assert isinstance(q.clauses[0], A.DropIndexClause)


def test_explain_profile():
    assert parse("EXPLAIN MATCH (n) RETURN n").explain
    assert parse("PROFILE MATCH (n) RETURN n").profile


def test_load_csv():
    q = parse("LOAD CSV WITH HEADERS FROM 'file:///x.csv' AS row RETURN row")
    c = q.clauses[0]
    assert isinstance(c, A.LoadCsvClause) and c.with_headers and c.alias == "row"


def test_comments_and_literals():
    q = parse("""// line comment
      RETURN 0x10 AS h, 0b101 AS b, 1.5e2 AS e, /* block */ 'it\\'s' AS s""")
    vals = [p.expr.value for p in q.clauses[0].items]
    assert vals == [16, 5, 150.0, "it's"]


def test_parse_errors():
    with pytest.raises(ParseError):
        parse("MATCH (n RETURN n")
    with pytest.raises(ParseError):
        parse("RETURN")
    with pytest.raises(ParseError):
        parse("MATCH (a)-[<-(b) RETURN a")


def test_shortest_path():
    q = parse("MATCH p = shortestPath((a)-[:R*]->(b)) RETURN p")
    path = q.clauses[0].paths[0]
    assert path.shortest == "single" and path.var == "p"
