"""Per-query latency benchmark suite — the falkorbench analogue
(reference: /root/reference/bench/src/falkorbench/queries.py 320-query
canon, metrics.py ratio gates; the Rust port's bar is p99 latency parity,
/root/reference/CLAUDE.md:27).

Workload: a 10K-node Person/KNOWS ring with ages/scores, plus Doc
(fulltext + vector), Geo (point), CIdx (composite index) and a multi-edge
corpus — the same corpus shape the reference benches, with our own query
set spanning every runtime category: expressions, scans, index seeks,
filters, aggregation, grouping, ordering, traversals, var-len, paths,
OPTIONAL/UNION/WITH pipelines, writes, MERGE, index procedures.

Per query: p50/p99 wall over REPS runs (first run excluded as warm-up —
it pays parse+plan; later runs hit the plan cache like a server would).

    python bench_queries.py                      # full suite
    QBENCH_OUT=QBENCH_r04.json python bench_queries.py
    QBENCH_FILTER=agg python bench_queries.py    # name substring filter

One JSON line per query; final line is the suite summary.  Future rounds
gate on ratios vs the committed artifact (1.25x wall, like the
reference's noisy-metric slack — wall is evidence, never the only gate).
"""

import json
import os
import sys
import time

SETUP = [
    "CREATE INDEX FOR (p:Person) ON (p.id)",
    "UNWIND range(0, 9999) AS i "
    "CREATE (:Person {id: i, name: 'p' + toString(i), age: i % 80, "
    "score: i * 1.5})",
    "UNWIND range(0, 9999) AS i MATCH (a:Person {id: i}), "
    "(b:Person {id: (i + 1) % 10000}) CREATE (a)-[:KNOWS {w: i % 10}]->(b)",
    "CREATE INDEX FOR (d:Doc) ON (d.id)",
    "UNWIND range(0, 99) AS i CREATE (:Doc {id: i, "
    "text: 'doc word' + toString(i), "
    "emb: vecf32([toFloat(i), toFloat(i % 10), toFloat(i % 7), 1.0])})",
    "CREATE VECTOR INDEX FOR (d:Doc) ON (d.emb) "
    "OPTIONS {dimension: 4, similarityFunction: 'euclidean'}",
    "CALL db.idx.fulltext.createNodeIndex('Doc', 'text')",
    "UNWIND range(0, 99) AS i MATCH (a:Doc {id: i}), "
    "(b:Doc {id: (i + 1) % 100}) CREATE (a)-[:SIMILAR {weight: i % 10}]->(b)",
    "CREATE INDEX FOR (c:CIdx) ON (c.a, c.b)",
    "UNWIND range(0, 99) AS i CREATE (:CIdx {a: i % 10, b: i})",
    "CREATE INDEX FOR (g:Geo) ON (g.loc)",
    "UNWIND range(0, 99) AS i CREATE (:Geo {id: i, "
    "loc: point({latitude: toFloat(i) / 100.0, "
    "longitude: toFloat(i) / 100.0})})",
    "CREATE (a:MEnd {id: 0}), (b:MEnd {id: 1}) WITH a, b "
    "CREATE (a)-[:MULTI {k: 1}]->(b), (a)-[:MULTI {k: 2}]->(b), "
    "(b)-[:MULTI {k: 3}]->(a)",
]

# (name, cypher) — write queries are self-reversing or idempotent so the
# corpus stays fixed across reps
QUERIES = [
    # ---- expressions (no graph access) ----
    ("return_1", "RETURN 1"),
    ("arith_sum", "UNWIND range(0, 999) AS i "
     "RETURN sum(i * 3 + i % 7 - i / 2)"),
    ("float_math", "UNWIND range(0, 999) AS i RETURN "
     "sum(sqrt(toFloat(i)) + abs(i - 500) + ceil(i / 3.0) + floor(i * 0.7))"),
    ("string_pipeline", "UNWIND range(0, 99) AS i RETURN "
     "count(split(replace(trim('  a,b,c  '), ',', ';'), ';'))"),
    ("list_comprehension",
     "RETURN size([x IN range(0, 9999) WHERE x % 2 = 0 | x * 2])"),
    ("reduce", "RETURN reduce(acc = 0, x IN range(0, 9999) | acc + x)"),
    ("list_ops", "UNWIND range(0, 99) AS i RETURN "
     "count(head(range(i, i + 10)) + last(range(i, i + 10)) "
     "+ size(tail(range(i, i + 10))))"),
    ("type_conversion", "UNWIND range(0, 999) AS i "
     "RETURN count(toInteger(toString(i)) + toInteger(toFloat(i)))"),
    ("temporal", "RETURN date('2024-01-15'), duration('P1D'), date().year"),
    ("spatial_distance", "RETURN distance("
     "point({latitude: 32.0, longitude: 34.8}), "
     "point({latitude: 31.0, longitude: 35.0}))"),
    ("string_extras",
     "RETURN left('hello', 2), right('hello', 2), lTrim('  x'), rTrim('x ')"),
    ("case_expr", "UNWIND range(0, 999) AS i RETURN "
     "sum(CASE WHEN i % 3 = 0 THEN 1 WHEN i % 3 = 1 THEN 2 ELSE 3 END)"),
    # ---- single-clause reads ----
    ("label_count", "MATCH (p:Person) RETURN count(p)"),
    ("index_seek", "MATCH (p:Person {id: 500}) RETURN p.name"),
    ("id_seek", "MATCH (n) WHERE id(n) = 5 RETURN n"),
    ("range_filter",
     "MATCH (p:Person) WHERE p.age > 45 AND p.score < 2000.0 "
     "RETURN count(p)"),
    ("string_predicates", "MATCH (p:Person) WHERE p.name STARTS WITH 'p1' "
     "AND p.name CONTAINS '2' AND p.name ENDS WITH '3' RETURN count(p)"),
    ("in_list", "MATCH (p:Person) WHERE p.id IN [1, 17, 4242, 9999] "
     "RETURN count(p)"),
    ("coalesce_scan", "MATCH (p:Person) "
     "RETURN count(coalesce(p.missing, p.id))"),
    ("entity_funcs", "MATCH (p:Person {id: 7}) "
     "RETURN id(p), labels(p), keys(p)"),
    ("return_distinct", "MATCH (p:Person) RETURN DISTINCT p.age"),
    ("order_by_limit",
     "MATCH (p:Person) RETURN p.name ORDER BY p.score DESC LIMIT 10"),
    ("skip_limit",
     "MATCH (p:Person) RETURN p.id ORDER BY p.id SKIP 5000 LIMIT 100"),
    ("composite_index_seek",
     "MATCH (c:CIdx {a: 3, b: 53}) RETURN count(c)"),
    # ---- traversals ----
    ("expand_all", "MATCH (a:Person)-[:KNOWS]->(b) RETURN count(b)"),
    ("two_hop", "MATCH (a:Person)-[:KNOWS]->()-[:KNOWS]->(c) "
     "RETURN count(c)"),
    ("three_hop",
     "MATCH (a:Person {id: 0})-[:KNOWS]->()-[:KNOWS]->()-[:KNOWS]->(d) "
     "RETURN count(d)"),
    ("edge_type", "MATCH (a:Person)-[r:KNOWS]->(b) RETURN count(type(r))"),
    ("edge_prop_filter",
     "MATCH (a:Person)-[r:KNOWS]->(b) WHERE r.w > 5 RETURN count(r)"),
    ("undirected", "MATCH (a:Person {id: 100})-[:KNOWS]-(b) RETURN b.id"),
    ("varlen_1_3",
     "MATCH (a:Person {id: 0})-[:KNOWS*1..3]->(b) RETURN count(b)"),
    ("varlen_1_50",
     "MATCH (a:Person {id: 0})-[:KNOWS*1..50]->(b) RETURN count(b)"),
    ("varlen_path_len", "MATCH path = (a:Person {id: 5})-[:KNOWS*1..3]->(b) "
     "RETURN sum(length(path))"),
    ("path_funcs", "MATCH p = (a:Person {id: 5})-[:KNOWS]->(b) "
     "RETURN nodes(p), relationships(p)"),
    ("optional_match", "MATCH (p:Person {id: 42}) "
     "OPTIONAL MATCH (p)-[:MISSING]->(q) RETURN p.id, q"),
    ("expand_into", "MATCH (a:Person {id: 0}), (b:Person {id: 1}) "
     "MATCH (a)-[:KNOWS]->(b) RETURN count(*)"),
    ("multi_edge", "MATCH (a:MEnd {id: 0})-[r:MULTI]->(b) "
     "RETURN count(r)"),
    ("shortest_path", "MATCH (a:Person {id: 0}), (b:Person {id: 40}) "
     "MATCH p = shortestPath((a)-[:KNOWS*..60]->(b)) RETURN length(p)"),
    ("cross_pattern", "MATCH (a:Person {id: 1})-[:KNOWS]->(x), "
     "(b:Person {id: 3})-[:KNOWS]->(y) RETURN x.id, y.id"),
    # ---- aggregation ----
    ("agg_count", "MATCH (p:Person) RETURN count(p.age)"),
    ("agg_sum", "MATCH (p:Person) RETURN sum(p.score)"),
    ("agg_min_max", "MATCH (p:Person) RETURN min(p.score), max(p.score)"),
    ("agg_avg", "MATCH (p:Person) RETURN avg(p.score)"),
    ("agg_percentile",
     "MATCH (p:Person) RETURN percentileDisc(p.score, 0.5)"),
    ("agg_stdev", "MATCH (p:Person) RETURN stDev(p.score)"),
    ("agg_collect",
     "MATCH (p:Person) WHERE p.id < 1000 RETURN size(collect(p.name))"),
    ("agg_count_distinct", "MATCH (p:Person) "
     "RETURN count(DISTINCT p.id % 100)"),
    ("group_by", "MATCH (p:Person) RETURN p.age, count(*) "
     "ORDER BY p.age LIMIT 10"),
    ("group_two_keys", "MATCH (p:Person) "
     "RETURN p.age % 10, p.id % 2, avg(p.score) "
     "ORDER BY p.age % 10, p.id % 2 LIMIT 10"),
    ("group_after_expand", "MATCH (a:Person)-[:KNOWS]->(b) "
     "RETURN b.age, count(a) ORDER BY b.age LIMIT 5"),
    # ---- pipelines ----
    ("with_filter_agg", "MATCH (p:Person) WITH p.age AS a, "
     "count(*) AS c WHERE c > 100 RETURN a, c ORDER BY a LIMIT 5"),
    ("with_chain", "MATCH (p:Person) WHERE p.id < 100 WITH p "
     "MATCH (p)-[:KNOWS]->(q) WITH q WHERE q.age > 10 "
     "RETURN count(q)"),
    ("unwind_join", "UNWIND [0, 10, 20, 30] AS i "
     "MATCH (p:Person {id: i}) RETURN p.name"),
    ("union", "MATCH (p:Person {id: 1}) RETURN p.id AS id "
     "UNION MATCH (p:Person {id: 2}) RETURN p.id AS id"),
    ("union_all", "MATCH (p:Person {id: 1}) RETURN p.id AS id "
     "UNION ALL MATCH (p:Person {id: 1}) RETURN p.id AS id"),
    ("exists_subquery", "MATCH (p:Person) WHERE p.id < 50 "
     "AND exists((p)-[:KNOWS]->()) RETURN count(p)"),
    ("pattern_comprehension", "MATCH (p:Person {id: 9}) "
     "RETURN size([(p)-[:KNOWS]->(q) | q.id])"),
    ("nested_apply", "MATCH (p:Person) WHERE p.id < 20 "
     "AND NOT (p)-[:MISSING]->() RETURN count(p)"),
    # ---- index procedures ----
    ("fulltext_query",
     "CALL db.idx.fulltext.queryNodes('Doc', 'word42') YIELD node "
     "RETURN node.id"),
    ("vector_query", "CALL db.idx.vector.queryNodes('Doc', 'emb', 3, "
     "vecf32([5.0, 5.0, 5.0, 1.0])) YIELD node, score RETURN node.id"),
    ("geo_distance", "MATCH (g:Geo) WHERE distance(g.loc, "
     "point({latitude: 0.5, longitude: 0.5})) < 10000 RETURN count(g)"),
    ("db_indexes", "CALL db.indexes() YIELD label RETURN count(label)"),
    ("db_labels", "CALL db.labels() YIELD label RETURN count(label)"),
    # ---- writes (self-reversing within one rep) ----
    ("create_delete_node",
     "CREATE (t:Tmp {id: 1}) WITH t DETACH DELETE t"),
    ("create_delete_edge", "MATCH (a:Person {id: 0}), (b:Person {id: 2}) "
     "CREATE (a)-[r:TMPE]->(b) WITH r DELETE r"),
    ("set_remove", "MATCH (p:Person {id: 123}) SET p.flag = true "
     "WITH p REMOVE p.flag RETURN p.id"),
    ("set_bulk", "MATCH (p:Person) WHERE p.id < 100 "
     "SET p.touched = p.id WITH count(*) AS c "
     "MATCH (q:Person) WHERE q.id < 100 REMOVE q.touched RETURN c"),
    ("merge_match", "MERGE (p:Person {id: 77}) RETURN p.name"),
    ("merge_create_delete", "MERGE (t:TmpM {id: 9}) "
     "WITH t DETACH DELETE t"),
    ("foreach", "MATCH (p:Person {id: 55}) "
     "FOREACH (i IN [1, 2, 3] | SET p.fe = i) REMOVE p.fe RETURN 1"),
    # ---- plan-shape extremes ----
    ("cartesian_small", "MATCH (a:MEnd), (b:MEnd) RETURN count(*)"),
    ("apply_limit", "MATCH (p:Person) WITH p LIMIT 10 "
     "MATCH (p)-[:KNOWS]->(q) RETURN count(q)"),
    ("count_star_all", "MATCH (n) RETURN count(*)"),
    ("all_nodes_filter", "MATCH (n) WHERE n.id = 77 RETURN labels(n)"),
    ("long_return", "MATCH (p:Person) WHERE p.id < 500 RETURN p.id, "
     "p.name, p.age, p.score ORDER BY p.id LIMIT 500"),
]


def main():
    import numpy as np

    import jax
    jax.config.update("jax_platforms", "cpu")

    from falkordb_tpu import FalkorDB

    reps = int(os.environ.get("QBENCH_REPS", "9"))
    out_path = os.environ.get("QBENCH_OUT")
    flt = os.environ.get("QBENCH_FILTER", "")
    lines = []

    def emit(obj):
        s = json.dumps(obj)
        print(s, flush=True)
        lines.append(s)
        if out_path:
            with open(out_path, "w") as f:
                f.write("\n".join(lines) + "\n")

    g = FalkorDB().select_graph("qbench")
    t0 = time.perf_counter()
    for q in SETUP:
        g.query(q)
    emit({"metric": "qbench_setup", "value": round(
        time.perf_counter() - t0, 2), "unit": "s",
        "queries": len(QUERIES)})

    p50s, p99s = [], []
    for name, cypher in QUERIES:
        if flt and flt not in name:
            continue
        try:
            g.query(cypher)  # warm-up: parse+plan (plan cache fills)
            ts = []
            for _ in range(reps):
                q0 = time.perf_counter()
                g.query(cypher)
                ts.append((time.perf_counter() - q0) * 1e3)
            ts = np.sort(np.array(ts))
            p50 = float(np.percentile(ts, 50))
            p99 = float(np.percentile(ts, 99))
            p50s.append(p50)
            p99s.append(p99)
            emit({"metric": f"qbench_{name}", "p50_ms": round(p50, 3),
                  "p99_ms": round(p99, 3), "unit": "ms"})
        except Exception as e:  # noqa: BLE001
            emit({"metric": f"qbench_{name}", "error": str(e)[:200]})
            raise
    emit({"metric": "qbench_summary", "queries": len(p50s),
          "p50_total_ms": round(sum(p50s), 1),
          "p50_geomean_ms": round(
              float(np.exp(np.mean(np.log(np.maximum(p50s, 1e-3))))), 3),
          "p99_worst_ms": round(max(p99s), 1) if p99s else None,
          "reps": reps})


if __name__ == "__main__":
    sys.exit(main())
