"""Temporal value arithmetic + shortestPath-in-expression-position.

Both are TCK-invisible reference behaviors verified by live probe in
round 4's verdict: the reference implements Date/Datetime/Time +-
Duration and Duration +- Duration on its Value type
(/root/reference/graph/src/runtime/value.rs:904-1070, helpers at
value.rs:696-750), and evaluates shortestPath() as an expression
(/root/reference/graph/src/runtime/eval.rs:1292)."""

import datetime as dt

import pytest

from falkordb_tpu import FalkorDB
from falkordb_tpu.runtime.temporal import (construct_duration,
                                           decompose_duration,
                                           parse_duration)
from falkordb_tpu.runtime.value import PathVal


@pytest.fixture
def g():
    return FalkorDB().select_graph("temporal")


def one(g, q):
    res = g.query(q)
    assert len(res.result_set) == 1
    return res.result_set[0][0]


# ------------------------------------------------------- duration encoding

def test_duration_anchored_encoding_matches_reference():
    # the reference encodes P1M as seconds-to(1970-02-01) = 31 days
    assert construct_duration(months=1).total_seconds() == 31 * 86400
    assert construct_duration(years=1).total_seconds() == 365 * 86400
    assert parse_duration("P1W").total_seconds() == 7 * 86400
    assert parse_duration("PT1H30M").total_seconds() == 5400
    y, m, s = decompose_duration(parse_duration("P1Y2M3DT4H"))
    assert (y, m) == (1, 2)
    assert s == 3 * 86400 + 4 * 3600


# ----------------------------------------------------- the 7 probe queries

def test_date_plus_duration(g):
    assert one(g, "RETURN date('2024-02-29') + duration('P1D')") \
        == dt.date(2024, 3, 1)


def test_datetime_plus_duration(g):
    assert one(g, "RETURN datetime('2024-01-01T10:00:00') + "
                  "duration('PT90M')") \
        == dt.datetime(2024, 1, 1, 11, 30)


def test_duration_plus_duration(g):
    assert one(g, "RETURN duration('P1D') + duration('PT12H')") \
        == dt.timedelta(days=1, hours=12)


def test_date_minus_duration(g):
    assert one(g, "RETURN date('2024-03-31') - duration('P1M')") \
        == dt.date(2024, 2, 29)  # clamp on subtract (value.rs:730)


def test_duration_minus_duration(g):
    assert one(g, "RETURN duration('P2D') - duration('P1D')") \
        == dt.timedelta(days=1)


def test_date_minus_date_is_error(g):
    # the reference has NO Date-Date arm (value.rs Sub falls to the
    # "Unexpected types" error); duration.between is the sanctioned way
    with pytest.raises(Exception):
        g.query("RETURN date('2024-01-02') - date('2024-01-01')")


def test_duration_minus_temporal_is_error(g):
    with pytest.raises(Exception):
        g.query("RETURN duration('P1D') - date('2024-01-01')")


# ----------------------------------------------- calendar-aware month math

def test_month_add_rolls_overflow(g):
    # Jan 31 + P1M -> Feb 31 -> 2 days past Feb 29 -> Mar 2 (leap 2024);
    # the reference's add rolls overflow forward, its subtract clamps
    assert one(g, "RETURN date('2024-01-31') + duration('P1M')") \
        == dt.date(2024, 3, 2)


def test_time_plus_duration_wraps(g):
    assert one(g, "RETURN localtime('23:30:00') + duration('PT45M')") \
        == dt.time(0, 15)


def test_datetime_minus_duration(g):
    assert one(g, "RETURN localdatetime('2024-03-01T00:30:00') - "
                  "duration('PT45M')") \
        == dt.datetime(2024, 2, 29, 23, 45)


def test_duration_components_reference_semantics(g):
    # get_duration_component (value.rs:607): calendar decomposition,
    # Float values, weeks always 0
    res = g.query("WITH duration('P1Y2M10DT25H') AS d "
                  "RETURN d.years, d.months, d.weeks, d.days, d.hours")
    assert res.result_set[0] == [1.0, 2.0, 0.0, 11.0, 1.0]


def test_duration_in_property_roundtrip(g):
    g.query("CREATE (:Ev {d: duration('P1M')})")
    assert one(g, "MATCH (e:Ev) RETURN e.d + duration('P1D')") \
        == construct_duration(months=1, days=1)


# ----------------------------------- shortestPath in expression position

@pytest.fixture
def spg(g):
    g.query("UNWIND range(0, 5) AS i CREATE (:N {k: i})")
    for u, v in [(0, 1), (1, 3), (0, 2), (2, 3), (0, 4), (4, 5), (5, 3)]:
        g.query("MATCH (a:N {k:$u}), (b:N {k:$v}) CREATE (a)-[:R]->(b)",
                params={"u": u, "v": v})
    return g


def test_shortest_path_as_expression(spg):
    res = spg.query("MATCH (a:N {k:0}), (b:N {k:3}) "
                    "RETURN shortestPath((a)-[:R*]->(b))")
    p = res.result_set[0][0]
    assert isinstance(p, PathVal)
    assert len(p.edges) == 2


def test_shortest_path_expr_in_function(spg):
    assert one(spg, "MATCH (a:N {k:0}), (b:N {k:3}) "
                    "RETURN length(shortestPath((a)-[:R*]->(b)))") == 2


def test_all_shortest_paths_as_expression(spg):
    res = spg.query("MATCH (a:N {k:0}), (b:N {k:3}) "
                    "RETURN allShortestPaths((a)-[:R*]->(b))")
    ps = res.result_set[0][0]
    assert isinstance(ps, list) and len(ps) == 2
    assert sorted(tuple(n.properties["k"] for n in p.nodes) for p in ps) \
        == [(0, 1, 3), (0, 2, 3)]


def test_shortest_path_expr_no_path_is_null(spg):
    # k:3 has no outgoing edges -> no path -> null (eval.rs returns Null)
    res = spg.query("MATCH (a:N {k:3}), (b:N {k:0}) "
                    "RETURN shortestPath((a)-[:R*]->(b)) IS NULL")
    assert res.result_set[0][0] is True


def test_shortest_path_expr_zero_hops_same_node(spg):
    res = spg.query("MATCH (a:N {k:0}) "
                    "RETURN length(shortestPath((a)-[:R*0..]->(a)))")
    assert res.result_set[0][0] == 0


def test_shortest_path_expr_respects_direction(spg):
    # incoming direction: 3<-1<-0 exists, so <- search finds length 2
    assert one(spg, "MATCH (a:N {k:3}), (b:N {k:0}) "
                    "RETURN length(shortestPath((a)<-[:R*]-(b)))") == 2


def test_duration_fractional_seconds_component(g):
    assert one(g, "RETURN duration('PT1.5S').seconds") == 1.5


def test_shortest_path_expr_in_where(spg):
    # review r5 find: WHERE conjuncts containing shortestPath() reported
    # zero slot deps and pushed below the scan binding b
    res = spg.query(
        "MATCH (a:N {k:0}), (b:N {k:3}) "
        "WHERE length(shortestPath((a)-[:R*]->(b))) = 2 "
        "RETURN a.k, b.k")
    assert res.result_set == [[0, 3]]


def test_huge_int_in_comprehension_falls_back(g):
    # review r5 find: >=32-item int lists with a beyond-float64 int
    # crashed fast_items_tv with a raw OverflowError
    res = g.query("RETURN size([x IN $l WHERE x > 0 | x])",
                  params={"l": [1] * 35 + [10 ** 400]})
    assert res.result_set == [[36]]


def test_duration_iso_verbose_format():
    from falkordb_tpu.runtime.temporal import format_duration
    assert format_duration(construct_duration(months=1, days=2,
                                              seconds=30)) == "P1M2DT30S"
    assert format_duration(construct_duration()) == "PT0S"
    assert format_duration(construct_duration(years=1, hours=2,
                                              minutes=3)) == "P1YT2H3M"
    assert format_duration(construct_duration(seconds=1.5)) == "PT1.5S"
