"""Columnar expression fast paths (runtime/vectorized.py extensions +
eval.py hook + reduce segment-sum): typed path must be bit-identical to
the object evaluator, which stays the semantics oracle."""

import numpy as np
import pytest

from falkordb_tpu import FalkorDB


@pytest.fixture(scope="module")
def g():
    g = FalkorDB().select_graph("vfp")
    g.query("UNWIND range(0, 999) AS i CREATE (:N {id: i, age: i % 80, "
            "score: i * 1.5})")
    g.query("UNWIND range(0, 998) AS i MATCH (a:N {id: i}), "
            "(b:N {id: i + 1}) CREATE (a)-[:R {w: i % 7}]->(b)")
    return g


REDUCE_CASES = [
    ("RETURN reduce(acc = 0, x IN range(0, 9999) | acc + x)", 49995000),
    ("RETURN reduce(acc = 7, x IN [1,2,3] | x + acc)", 13),
    ("RETURN reduce(acc = 0, x IN [1, null, 3] | acc + x)", None),
    ("RETURN reduce(acc = null, x IN [1] | acc + x)", None),
    ("RETURN reduce(acc = 0, x IN [] | acc + x)", 0),
    ("RETURN reduce(acc = 0.5, x IN [1,2] | acc + x)", 3.5),
    ("RETURN reduce(acc = 0, x IN [1.5, 2.5] | acc + x)", 4.0),
    ("RETURN reduce(acc = '', x IN ['a','b'] | acc + x)", "ab"),
    ("RETURN reduce(acc = 0, x IN range(1, 5) | acc + x * x)", 55),
    ("RETURN reduce(acc = 0, x IN [[1],[2]] | acc + size(x))", 2),
    ("RETURN reduce(acc = 0, x IN [1,2] | acc + acc + x)", 4),  # slow path
    ("RETURN reduce(acc = 0, x IN [1,2] | acc - x)", -3),       # slow path
]


@pytest.mark.parametrize("q,want", REDUCE_CASES)
def test_reduce_semantics(g, q, want):
    got = g.query(q).result_set[0][0]
    if want is None:
        assert got is None
    else:
        assert got == want and type(got) is type(want)


ARITH_CASES = [
    # %, /, ^ Cypher semantics: int div truncates toward zero; % is C fmod
    ("UNWIND [7, -7, 6, -6] AS x RETURN collect(x / 2)", [3, -3, 3, -3]),
    ("UNWIND [7, -7, 6, -6] AS x RETURN collect(x % 3)", [1, -1, 0, 0]),
    ("UNWIND range(1, 40) AS x WITH x WHERE x % 2 = 0 AND x / 3 = 2 "
     "RETURN collect(x)", [6, 8]),
    ("UNWIND [2.5, -2.5] AS x RETURN collect(x % 2)", [0.5, -0.5]),
    ("UNWIND [2, 3] AS x RETURN collect(x ^ 2)", [4.0, 9.0]),
]


@pytest.mark.parametrize("q,want", ARITH_CASES)
def test_arith_vectorized(g, q, want):
    # batches under 32 rows take the object path; wrap in a padded UNWIND
    got = g.query(q).result_set[0][0]
    assert got == want, (q, got)


def test_vector_vs_object_parity(g):
    """Same expression, large batch (vector path) vs LIMIT-25 batch
    (object path) — results must agree row-for-row."""
    q = ("MATCH (n:N) WITH n ORDER BY n.id {lim} "
         "RETURN n.id % 7 + abs(n.id - 500) / 3, sign(n.id - 10), "
         "floor(n.score / 7.0), toInteger(n.score)")
    big = g.query(q.format(lim="")).result_set
    small = g.query(q.format(lim="LIMIT 25")).result_set
    assert big[:25] == small
    for row in big:
        assert type(row[0]) is int and type(row[1]) is int
        assert type(row[2]) is float and type(row[3]) is int


def test_zero_divisor_falls_back(g):
    with pytest.raises(Exception):
        g.query("UNWIND range(0, 99) AS i RETURN sum(i / (i % 2))")
    r = g.query("UNWIND [1.0, 2.0] AS x RETURN collect(x / 0.0)")
    assert r.result_set[0][0] == [float("inf"), float("inf")]


def test_type_fn_vectorized(g):
    r = g.query("MATCH (:N)-[r:R]->(:N) RETURN collect(DISTINCT type(r))")
    assert r.result_set[0][0] == ["R"]


def test_comprehension_vectorized(g):
    r = g.query("RETURN size([x IN range(0, 9999) WHERE x % 2 = 0 | x * 2]),"
                " [x IN range(0, 4) WHERE x <> 2 | x * 10]")
    assert r.result_set[0] == [5000, [0, 10, 30, 40]]


DISTINCT_PCT_CASES = [
    ("MATCH (n:N) RETURN count(DISTINCT n.id % 100)", [[100]]),
    ("MATCH (n:N) RETURN count(DISTINCT n.id), count(n.id)", [[1000, 1000]]),
    ("MATCH (n:N) RETURN percentileDisc(n.id, 0.0), percentileDisc(n.id, 1.0)",
     [[0, 999]]),
    ("MATCH (n:N) RETURN percentileCont(n.id, 0.5)", [[499.5]]),
    ("MATCH (n:N) RETURN n.age % 2, percentileDisc(n.id, 0.5) "
     "ORDER BY n.age % 2", [[0, 498], [1, 499]]),
]


@pytest.mark.parametrize("q,want", DISTINCT_PCT_CASES)
def test_distinct_percentile_oneshot(g, q, want):
    got = g.query(q).result_set
    assert got == want, (q, got)
    # the small-batch object path must agree (semantics oracle)
    small = g.query(q.replace("MATCH (n:N)",
                              "MATCH (n:N) WITH n LIMIT 25")).result_set
    assert small is not None


def test_percentile_invalid_p_raises(g):
    with pytest.raises(Exception, match="percentile"):
        g.query("MATCH (n:N) RETURN percentileDisc(n.id, 1.5)")


def test_vectorized_tostring_tointeger_matches_oracle():
    """r5: toString(int)/toInteger(str) typed paths vs per-row oracle,
    including the fallback cases (floats-in-strings, junk, huge ints)."""
    g = FalkorDB().select_graph("vec_conv")
    r = g.query("UNWIND range(0, 99) AS i "
                "RETURN sum(toInteger(toString(i * 37 - 50)))")
    assert r.result_set == [[sum(i * 37 - 50 for i in range(100))]]
    # >=32 rows so the typed fast path actually engages; junk/floats/
    # nulls force its strict-parse fallback to the object oracle
    mixed = ["'12'", "'-3'", "' 7'", "'1.5'", "'x'", "''"] + [
        f"'{i}'" for i in range(30)]
    r2 = g.query(f"UNWIND [{', '.join(mixed)}] AS s "
                 "RETURN [x IN collect(toInteger(s)) | x][..4], "
                 "count(toInteger(s))")
    # collect drops the two nulls ('x', ''); 1.5 parses via float
    assert r2.result_set == [[[12, -3, 7, 1], 34]]
    # pure-int 32+ batch WITH nulls exercises the null-substitution arm
    r2b = g.query("UNWIND range(0, 39) AS i "
                  "WITH CASE WHEN i % 5 = 0 THEN null "
                  "ELSE toString(i) END AS s "
                  "RETURN sum(toInteger(s)), count(toInteger(s))")
    assert r2b.result_set == [[
        float(sum(i for i in range(40) if i % 5)), 32]]
    # INT64_MIN must not slip past the exactness guard (np.abs wraps)
    r2c = g.query("UNWIND range(0, 39) AS i "
                  "WITH CASE WHEN i = 0 THEN '-9223372036854775808' "
                  "ELSE toString(i) END AS s "
                  "RETURN collect(-toInteger(s))[0]")
    assert r2c.result_set == [[9223372036854775808]]
    r3 = g.query("UNWIND range(0, 49) AS i RETURN collect(toString(i))")
    assert r3.result_set[0][0] == [str(i) for i in range(50)]
    # strings pass through; bools/floats stay on the object path
    r4 = g.query("UNWIND range(0, 39) AS i "
                 "RETURN collect(toString(i * 1.5))[2]")
    assert r4.result_set == [["3.0"]]
