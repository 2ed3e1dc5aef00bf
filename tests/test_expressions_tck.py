"""Expression-semantics tests in the openCypher TCK's spirit
(reference: tests/tck/features/expressions/*)."""

import math

import pytest

from falkordb_tpu import FalkorDB


@pytest.fixture
def g():
    return FalkorDB().select_graph("tck")


def one(g, expr, params=None):
    return g.query(f"RETURN {expr} AS r", params=params).result_set[0][0]


# ------------------------------------------------------------ arithmetic

def test_integer_division_truncates_toward_zero(g):
    assert one(g, "7 / 2") == 3
    assert one(g, "-7 / 2") == -3
    assert one(g, "7 % 2") == 1
    assert one(g, "-7 % 2") == -1


def test_float_division(g):
    assert one(g, "7.0 / 2") == 3.5
    assert one(g, "1 / 2.0") == 0.5


def test_division_by_zero_errors(g):
    with pytest.raises(Exception):
        one(g, "1 / 0")
    assert one(g, "1.0 / 0") == math.inf


def test_power_returns_float(g):
    assert one(g, "2 ^ 10") == 1024.0
    assert isinstance(one(g, "2 ^ 2"), float)


def test_unary_minus(g):
    assert one(g, "-(3 + 4)") == -7
    assert one(g, "- -5") == 5


# ----------------------------------------------------------------- string

def test_string_concat(g):
    assert one(g, "'a' + 'b'") == "ab"
    assert one(g, "'a' + 1") == "a1"
    assert one(g, "1 + 'a'") == "1a"


def test_string_predicates_null(g):
    assert one(g, "null STARTS WITH 'a'") is None
    assert one(g, "'abc' CONTAINS null") is None
    assert one(g, "'abc' ENDS WITH 'bc'") is True


def test_regex(g):
    assert one(g, "'abc' =~ 'a.*'") is True
    assert one(g, "'abc' =~ 'b.*'") is False


# ------------------------------------------------------------------ lists

def test_list_indexing(g):
    assert one(g, "[1,2,3][0]") == 1
    assert one(g, "[1,2,3][-1]") == 3
    assert one(g, "[1,2,3][5]") is None
    assert one(g, "[1,2,3][1..]") == [2, 3]
    assert one(g, "[1,2,3][..2]") == [1, 2]
    assert one(g, "[1,2,3][-2..]") == [2, 3]


def test_list_concat_and_in(g):
    assert one(g, "[1] + [2]") == [1, 2]
    assert one(g, "1 IN [1, 2]") is True
    assert one(g, "3 IN [1, 2]") is False
    assert one(g, "null IN [1, 2]") is None
    assert one(g, "1 IN [null, 1]") is True
    assert one(g, "3 IN [null, 1]") is None
    assert one(g, "1 IN []") is False
    assert one(g, "null IN []") is False


def test_range_fn(g):
    assert one(g, "range(1, 3)") == [1, 2, 3]
    assert one(g, "range(0, 10, 3)") == [0, 3, 6, 9]
    assert one(g, "range(3, 1, -1)") == [3, 2, 1]


def test_nested_comprehension(g):
    assert one(g, "[x IN [1,2,3] | [y IN [1,2] | x * y]]") == [
        [1, 2], [2, 4], [3, 6]]


# ---------------------------------------------------------------- boolean

def test_three_valued_logic(g):
    assert one(g, "true AND null") is None
    assert one(g, "false AND null") is False
    assert one(g, "true OR null") is True
    assert one(g, "false OR null") is None
    assert one(g, "NOT null") is None
    assert one(g, "null XOR true") is None


def test_comparison_nulls_and_types(g):
    assert one(g, "1 < null") is None
    assert one(g, "'a' < 1") is None  # cross-type comparison → null
    assert one(g, "1 = '1'") is False
    assert one(g, "1 = 1.0") is True


# -------------------------------------------------------------------- map

def test_map_access(g):
    assert one(g, "{a: {b: 2}}.a.b") == 2
    assert one(g, "{a: 1}['a']") == 1
    assert one(g, "{a: 1}.missing") is None
    assert one(g, "keys({b: 1, a: 2})") == ["a", "b"]


# ------------------------------------------------------------------- CASE

def test_simple_case(g):
    assert one(g, "CASE 2 WHEN 1 THEN 'one' WHEN 2 THEN 'two' END") == "two"
    assert one(g, "CASE 9 WHEN 1 THEN 'one' ELSE 'other' END") == "other"
    assert one(g, "CASE 9 WHEN 1 THEN 'one' END") is None


# ------------------------------------------------------------ aggregation

def test_aggregates_skip_nulls(g):
    r = g.query("UNWIND [1, null, 3] AS x "
                "RETURN count(x), sum(x), avg(x), collect(x)")
    assert r.result_set == [[2, 4, 2.0, [1, 3]]]


def test_count_distinct(g):
    r = g.query("UNWIND [1, 1, 2, null] AS x RETURN count(DISTINCT x)")
    assert r.result_set == [[2]]


def test_min_max_mixed(g):
    r = g.query("UNWIND [3, 1, 2] AS x RETURN min(x), max(x)")
    assert r.result_set == [[1, 3]]


def test_stdev_percentile(g):
    r = g.query("UNWIND [2, 4, 4, 4, 5, 5, 7, 9] AS x "
                "RETURN stDev(x), percentileDisc(x, 0.5)")
    sd, p50 = r.result_set[0]
    assert abs(sd - 2.138) < 0.01
    assert p50 == 4


def test_aggregate_in_expression(g):
    r = g.query("UNWIND [1,2,3] AS x RETURN sum(x) * 2 + count(x)")
    assert r.result_set == [[15]]


# --------------------------------------------------------------- entities

def test_entity_functions(g):
    g.query("CREATE (:A {x: 1})-[:R {w: 2}]->(:B)")
    r = g.query("MATCH (a:A)-[e:R]->(b:B) RETURN labels(a), type(e), "
                "properties(e), id(a) >= 0, startNode(e) = a, endNode(e) = b")
    row = r.result_set[0]
    assert row == [["A"], "R", {"w": 2}, True, True, True]


def test_quantifiers(g):
    assert one(g, "all(x IN [1,2] WHERE x > 0)") is True
    assert one(g, "any(x IN [1,2] WHERE x > 1)") is True
    assert one(g, "none(x IN [1,2] WHERE x > 2)") is True
    assert one(g, "single(x IN [1,2] WHERE x = 1)") is True
    assert one(g, "all(x IN [] WHERE x > 0)") is True
    assert one(g, "any(x IN [] WHERE x > 0)") is False


def test_reduce(g):
    assert one(g, "reduce(acc = 0, x IN [1,2,3] | acc + x)") == 6
    assert one(g, "reduce(s = '', x IN ['a','b'] | s + x)") == "ab"


def test_coalesce_chain(g):
    assert one(g, "coalesce(null, null, 3)") == 3
    assert one(g, "coalesce(null)") is None


def test_tostring_tointeger(g):
    assert one(g, "toInteger('42')") == 42
    assert one(g, "toInteger('4.9')") == 4
    assert one(g, "toInteger('abc')") is None
    assert one(g, "toFloat('1.5')") == 1.5
    assert one(g, "toString(42)") == "42"
    assert one(g, "toString(true)") == "true"
    assert one(g, "toBoolean('true')") is True


def test_split_join_case_fns(g):
    assert one(g, "split('a,b,c', ',')") == ["a", "b", "c"]
    assert one(g, "toUpper('ab') + toLower('CD')") == "ABcd"
    assert one(g, "substring('hello', 1, 3)") == "ell"
    assert one(g, "replace('aaa', 'a', 'b')") == "bbb"
    assert one(g, "reverse('abc')") == "cba"
    assert one(g, "trim('  x  ')") == "x"
    assert one(g, "size('abcd')") == 4
