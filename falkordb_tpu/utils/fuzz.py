"""Coverage-guided query fuzzer (reference: fuzz/fuzz_targets/
fuzz_target_runtime.rs — libfuzzer parser→runtime target).

The target is the full query path: tokenize → parse → plan → execute
against a small fixed graph.  Coverage feedback uses sys.monitoring line
events over the falkordb_tpu.lang / .runtime modules (the same role
libfuzzer's SanitizerCoverage plays); inputs that light up new lines are
kept in the corpus and preferentially mutated.

Any exception other than the engine's own error types (LexError,
ParseError, PlanError, EvalError, QueryTimeout, plus ValueError/TypeError
from Cypher value semantics) is a FINDING — the engine must reject
arbitrary input gracefully, never crash with an internal error.
"""

from __future__ import annotations

import random
import sys

_SEEDS = [
    "MATCH (n) RETURN n",
    "MATCH (a:Person {name: 'x'})-[r:KNOWS*1..3]->(b) WHERE a.age > 1 "
    "RETURN a, r, b ORDER BY a.age SKIP 1 LIMIT 2",
    "CREATE (a:A {v: 1})-[:R {w: 2.5}]->(b:B) RETURN a",
    "MERGE (n:X {k: 1}) ON CREATE SET n.c = 1 ON MATCH SET n.m = 1",
    "UNWIND range(1, 3) AS x WITH x WHERE x > 1 RETURN collect(x)",
    "MATCH (n) OPTIONAL MATCH (n)-->(m) RETURN n, count(m) AS c",
    "RETURN [x IN [1,2,3] WHERE x > 1 | x * 2] AS l, {a: 1, b: [true]}",
    "MATCH p = shortestPath((a)-[*..4]->(b)) WHERE a <> b RETURN length(p)",
    "MATCH (n) DETACH DELETE n",
    "MATCH (n:A) SET n += {x: 1} REMOVE n:B RETURN labels(n)",
    "CALL db.labels() YIELD label RETURN label",
    "RETURN CASE WHEN 1 > 2 THEN 'a' ELSE 'b' END",
    "MATCH (a), (b) WHERE (a)-->(b) XOR a.v IN [1, null] RETURN a",
    "WITH 1 AS x CALL { WITH x RETURN x + 1 AS y } RETURN y UNION RETURN 2 AS y",
    "FOREACH (i IN range(1,2) | CREATE (:F {i: i}))",
    "LOAD CSV FROM 'file:///nope.csv' AS row RETURN row",
    "RETURN date('2024-01-01') + duration('P1D'), point({latitude:1, longitude:2})",
]

_TOKENS = [
    "MATCH", "RETURN", "WHERE", "CREATE", "MERGE", "WITH", "UNWIND",
    "OPTIONAL", "DELETE", "SET", "REMOVE", "ORDER BY", "SKIP", "LIMIT",
    "DISTINCT", "UNION", "ALL", "AND", "OR", "NOT", "IN", "IS NULL",
    "STARTS WITH", "CONTAINS", "count(*)", "collect(x)", "n.prop", "(n)",
    "(n:L)", "-[r:T]->", "<-[]-", "-[*1..2]->", "[1, 2]", "{a: 1}", "$param",
    "null", "true", "1.5e3", "0x1F", "'s'", "\"d\"", "*", ",", "(", ")",
    "[", "]", "{", "}", ".", ":", "|", "..", "+", "-", "=", "<>", "<=", "^",
]

ENGINE_ERRORS: tuple = ()


def _engine_errors():
    global ENGINE_ERRORS
    if ENGINE_ERRORS:
        return ENGINE_ERRORS
    from falkordb_tpu.lang.lexer import LexError
    from falkordb_tpu.lang.parser import ParseError
    from falkordb_tpu.lang.planner import PlanError
    from falkordb_tpu.runtime.eval import EvalError
    from falkordb_tpu.runtime.ops import QueryTimeout

    ENGINE_ERRORS = (LexError, ParseError, PlanError, EvalError,
                     QueryTimeout, ValueError, TypeError, KeyError,
                     ZeroDivisionError, OverflowError, RecursionError,
                     ArithmeticError)
    return ENGINE_ERRORS


class Coverage:
    """Line-coverage collector over the engine modules (sys.monitoring)."""

    TOOL = 3  # sys.monitoring.PROFILER_ID is taken under pytest-cov

    def __init__(self, prefixes=("falkordb_tpu/lang", "falkordb_tpu/runtime",
                                 "falkordb_tpu/graph")):
        self.prefixes = prefixes
        self.seen: set = set()
        self._new = 0

    def start(self):
        mon = sys.monitoring
        mon.use_tool_id(self.TOOL, "fuzz")
        mon.set_events(self.TOOL, mon.events.LINE)
        mon.register_callback(self.TOOL, mon.events.LINE, self._on_line)

    def stop(self):
        mon = sys.monitoring
        mon.set_events(self.TOOL, 0)
        mon.free_tool_id(self.TOOL)

    def _on_line(self, code, line):
        f = code.co_filename
        if not any(p in f for p in self.prefixes):
            return sys.monitoring.DISABLE  # never re-fire for this line
        key = (f, line)
        if key not in self.seen:
            self.seen.add(key)
            self._new += 1
        return sys.monitoring.DISABLE  # first hit is all we need

    def take_new(self) -> int:
        n = self._new
        self._new = 0
        return n


def mutate(q: str, rng: random.Random) -> str:
    op = rng.randrange(6)
    if op == 0 and len(q) > 2:  # delete a span
        i = rng.randrange(len(q))
        j = min(len(q), i + rng.randrange(1, 8))
        return q[:i] + q[j:]
    if op == 1:  # insert a token
        i = rng.randrange(len(q) + 1)
        return q[:i] + " " + rng.choice(_TOKENS) + " " + q[i:]
    if op == 2 and len(q) > 2:  # duplicate a span
        i = rng.randrange(len(q))
        j = min(len(q), i + rng.randrange(1, 12))
        return q[:i] + q[i:j] + q[i:j] + q[j:]
    if op == 3:  # splice two seeds
        other = rng.choice(_SEEDS)
        i = rng.randrange(len(q) + 1)
        k = rng.randrange(len(other) + 1)
        return q[:i] + other[k:]
    if op == 4 and q:  # flip a character
        i = rng.randrange(len(q))
        return q[:i] + chr(rng.randrange(32, 127)) + q[i + 1:]
    # nest: wrap in a clause
    return rng.choice([
        f"WITH 1 AS _w {q}",
        f"{q} UNION {rng.choice(_SEEDS)}",
        f"FOREACH (i IN [1] | CREATE (:Z)) {q}" if not
        q.upper().startswith(("RETURN", "WITH")) else q,
    ])


def run_fuzz(iterations: int = 500, seed: int = 0, timeout_ms: int = 200,
             verbose: bool = False):
    """Returns (findings, corpus_size, coverage_lines).  A finding is
    (query, exception) for any non-engine-error escape."""
    from falkordb_tpu import FalkorDB

    rng = random.Random(seed)
    db = FalkorDB()
    g = db.select_graph("fuzz")
    g.query("CREATE (:Person {name: 'x', age: 1})-[:KNOWS {w: 1}]->"
            "(:Person {name: 'y', age: 2})-[:KNOWS]->(:A {v: 1})")
    errs = _engine_errors()
    cov = Coverage()
    cov.start()
    corpus = list(_SEEDS)
    findings = []
    try:
        for q in corpus:  # seed pass establishes the baseline map
            try:
                g.query(q, timeout=timeout_ms)
            except errs:
                pass
            except Exception as e:  # noqa: BLE001
                findings.append((q, e))
        cov.take_new()
        for i in range(iterations):
            base = rng.choice(corpus[-64:] if len(corpus) > 64 else corpus)
            q = mutate(base, rng)
            if len(q) > 4096:
                q = q[:4096]
            try:
                g.query(q, timeout=timeout_ms)
            except errs:
                pass
            except Exception as e:  # noqa: BLE001
                findings.append((q, e))
            if cov.take_new():
                corpus.append(q)  # new coverage → keep for future mutation
                if verbose:
                    print(f"[{i}] corpus+={len(corpus)} cov={len(cov.seen)}")
    finally:
        cov.stop()
    return findings, len(corpus), len(cov.seen)


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    findings, corpus, lines = run_fuzz(n, verbose=True)
    print(f"iterations={n} corpus={corpus} covered_lines={lines} "
          f"findings={len(findings)}")
    for q, e in findings[:20]:
        print(f"  {type(e).__name__}: {e}\n    {q[:160]!r}")
    sys.exit(1 if findings else 0)
