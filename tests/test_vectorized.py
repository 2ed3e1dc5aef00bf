"""Vectorized (typed columnar) runtime fast paths.

VERDICT r1 item 2: Filter/Aggregate/Sort/Distinct must run whole-batch
array programs (the reference's vectorized.rs / ops/aggregate.rs role) on
typed columns, with the per-row object path as fallback.  These tests
assert BOTH the results and that the fast path actually engaged (PROFILE's
"Vectorized rows" counter)."""

import random

import pytest

from falkordb_tpu import FalkorDB


@pytest.fixture
def g():
    return FalkorDB().select_graph("vec")


def _profile(g, q):
    return g.profile(q).profile


COUNTRIES = ["AT", "BE", "CZ", "DE", "EE"]


def _ldbc_style(g, n=300, seed=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append(f"(:Person {{id: {i}, country: '{rng.choice(COUNTRIES)}',"
                    f" age: {rng.randint(18, 80)}}})")
    g.query("CREATE " + ", ".join(rows))
    pairs = set()
    while len(pairs) < 4 * n:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            pairs.add((a, b))
    g.query(
        "UNWIND $pairs AS p "
        "MATCH (a:Person {id: p[0]}), (b:Person {id: p[1]}) "
        "CREATE (a)-[:KNOWS]->(b)", params={"pairs": [list(p) for p in pairs]})
    return pairs


def test_aggregate_vectorized_ldbc_style(g):
    pairs = _ldbc_style(g)
    res = g.query("MATCH (p:Person)-[:KNOWS]->(q:Person) "
                  "RETURN q.country, count(*) ORDER BY q.country")
    # oracle
    country = {}
    for r in g.query("MATCH (p:Person) RETURN p.id, p.country").result_set:
        country[r[0]] = r[1]
    want = {}
    for a, b in pairs:
        want[country[b]] = want.get(country[b], 0) + 1
    got = {r[0]: r[1] for r in res.result_set}
    assert got == want
    # the profile must show the Aggregate (and Sort) fast paths engaged for
    # every input row — no per-row Python
    prof = _profile(g, "MATCH (p:Person)-[:KNOWS]->(q:Person) "
                       "RETURN q.country, count(*) ORDER BY q.country")
    agg = [ln for ln in prof.splitlines() if "Aggregate" in ln]
    assert agg and all("Vectorized rows: " in ln for ln in agg), prof
    n_edges = len(pairs)
    assert f"Vectorized rows: {n_edges}" in agg[0]


def test_filter_vectorized(g):
    _ldbc_style(g)
    res = g.query("MATCH (p:Person) WHERE p.age > 40 AND p.country = 'DE' "
                  "RETURN p.id ORDER BY p.id")
    want = [r[0] for r in g.query(
        "MATCH (p:Person) RETURN p.id, p.age, p.country ORDER BY p.id"
    ).result_set if r[1] > 40 and r[2] == "DE"]
    assert [r[0] for r in res.result_set] == want
    prof = _profile(g, "MATCH (p:Person) WHERE p.age > 40 AND "
                       "p.country = 'DE' RETURN p.id")
    flt = [ln for ln in prof.splitlines() if "Filter" in ln]
    assert flt and all("Vectorized rows: " in ln for ln in flt), prof


def test_sort_vectorized_with_nulls(g):
    g.query("CREATE (:X {v: 3}), (:X {v: 1}), (:X), (:X {v: 2.5}), "
            "(:X {v: -7})")
    res = g.query("MATCH (x:X) RETURN x.v ORDER BY x.v")
    assert [r[0] for r in res.result_set] == [-7, 1, 2.5, 3, None]
    res = g.query("MATCH (x:X) RETURN x.v ORDER BY x.v DESC")
    assert [r[0] for r in res.result_set] == [None, 3, 2.5, 1, -7]
    prof = _profile(g, "MATCH (x:X) RETURN x.v ORDER BY x.v DESC")
    srt = [ln for ln in prof.splitlines() if "Sort" in ln]
    assert srt and all("Vectorized rows: " in ln for ln in srt), prof


def test_sort_multi_key_mixed_direction(g):
    g.query("UNWIND [['a', 2], ['b', 1], ['a', 1], ['b', 2], ['a', 3]] AS r "
            "CREATE (:Y {s: r[0], v: r[1]})")
    res = g.query("MATCH (y:Y) RETURN y.s, y.v ORDER BY y.s ASC, y.v DESC")
    assert [tuple(r) for r in res.result_set] == [
        ("a", 3), ("a", 2), ("a", 1), ("b", 2), ("b", 1)]


def test_distinct_vectorized(g):
    g.query("UNWIND range(0, 999) AS i CREATE (:D {v: i % 7})")
    res = g.query("MATCH (d:D) RETURN DISTINCT d.v ORDER BY d.v")
    assert [r[0] for r in res.result_set] == list(range(7))
    prof = _profile(g, "MATCH (d:D) WITH DISTINCT d.v AS v RETURN v")
    dst = [ln for ln in prof.splitlines() if "Distinct" in ln]
    assert dst and all("Vectorized rows: " in ln for ln in dst), prof


def test_aggregate_min_max_sum_avg_typed(g):
    g.query("UNWIND range(1, 100) AS i "
            "CREATE (:V {k: i % 3, v: i})")
    res = g.query("MATCH (n:V) RETURN n.k, sum(n.v), min(n.v), max(n.v), "
                  "avg(n.v), count(n.v) ORDER BY n.k")
    rows = {r[0]: r[1:] for r in res.result_set}
    for k in (0, 1, 2):
        vals = [i for i in range(1, 101) if i % 3 == k]
        s, mn, mx, av, c = rows[k]
        assert (s, mn, mx, c) == (sum(vals), min(vals), max(vals), len(vals))
        assert abs(av - sum(vals) / len(vals)) < 1e-9
        # sum() reports in double precision (TCK Set6/Remove3); min/max
        # preserve the input type
        assert isinstance(s, float) and isinstance(mn, int)


def test_aggregate_mixed_numeric_falls_back(g):
    # a column mixing ints and floats must keep per-value types in min/max
    g.query("CREATE (:M {v: 1}), (:M {v: 2.5}), (:M {v: 3})")
    res = g.query("MATCH (m:M) RETURN max(m.v), min(m.v), sum(m.v)")
    mx, mn, s = res.result_set[0]
    assert mx == 3 and isinstance(mx, int)
    assert mn == 1 and isinstance(mn, int)
    assert s == 6.5


def test_vectorized_matches_fallback_random(g):
    """Differential: vectorized pipeline vs per-row oracle on random data."""
    rng = random.Random(3)
    rows = []
    for i in range(500):
        v = rng.choice([rng.randint(-50, 50), None])
        s = rng.choice(["x", "y", "z", None])
        rows.append((i, v, s))
    g.query("UNWIND $rows AS r CREATE (:R {id: r[0], v: r[1], s: r[2]})",
            params={"rows": [list(r) for r in rows]})
    res = g.query("MATCH (r:R) WHERE r.v >= 0 AND r.s <> 'x' "
                  "RETURN r.s, count(*), sum(r.v), min(r.v), max(r.v) "
                  "ORDER BY r.s")
    want = {}
    for _, v, s in rows:
        if v is not None and v >= 0 and s is not None and s != "x":
            st = want.setdefault(s, [0, 0, None, None])
            st[0] += 1
            st[1] += v
            st[2] = v if st[2] is None else min(st[2], v)
            st[3] = v if st[3] is None else max(st[3], v)
    got = {r[0]: list(r[1:]) for r in res.result_set}
    assert got == {k: v for k, v in want.items()}


def test_in_list_and_string_ops_vectorized(g):
    g.query("UNWIND ['apple', 'banana', 'cherry', 'avocado'] AS f "
            "CREATE (:F {name: f})")
    res = g.query("MATCH (f:F) WHERE f.name STARTS WITH 'a' "
                  "RETURN f.name ORDER BY f.name")
    assert [r[0] for r in res.result_set] == ["apple", "avocado"]
    res = g.query("MATCH (f:F) WHERE f.name IN ['banana', 'cherry', 'kiwi'] "
                  "RETURN f.name ORDER BY f.name")
    assert [r[0] for r in res.result_set] == ["banana", "cherry"]
    res = g.query("MATCH (f:F) WHERE f.name CONTAINS 'an' "
                  "RETURN f.name ORDER BY f.name")
    assert [r[0] for r in res.result_set] == ["banana"]
