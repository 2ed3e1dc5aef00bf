"""Built-in coverage parity: every name the reference registers via
cypher_fn! (graph/src/runtime/functions/*.rs — 128 names, extracted
verbatim) must resolve in this engine.  Names live in three layers here:

  * scalar/list/temporal/etc functions → runtime.functions.FUNCTIONS
  * aggregates → the Aggregate operator's kernel set (runtime/ops.py
    _agg_new/_agg_step; the reference also registers these as functions)
  * operator-functions (add/contains/starts_with/…) → expression
    operators in runtime/eval.py (the reference reifies its binary ops
    as functions; our evaluator dispatches them structurally)
  * procedures (db.* / dbms.* / algo.*) → the procedure registries
"""

import pytest

from falkordb_tpu import FalkorDB

# the 128 cypher_fn! registrations, verbatim from the reference source
REFERENCE_FUNCTIONS = """
abs acos add algo.BFS algo.HarmonicCentrality algo.MSF algo.SPpaths
algo.SSpaths algo.WCC algo.betweenness algo.labelPropagation algo.maxFlow
algo.pageRank asin atan atan2 avg case ceil coalesce collect contains cos
cot count date date.transaction db.constraints
db.idx.fulltext.createNodeIndex db.idx.fulltext.drop
db.idx.fulltext.queryNodes db.idx.fulltext.queryRelationships
db.idx.vector.queryNodes db.idx.vector.queryRelationships db.indexes
db.labels db.meta.stats db.propertyKeys db.relationshipTypes
dbms.functions dbms.procedures degrees distance duration e endnode
ends_with exists exp floor hasLabels haversin head id indegree intern
isEmpty is_null keys labels last left length list.dedup list.insert
list.insertListElements list.remove list.sort localdatetime
localdatetime.transaction localtime localtime.transaction log log10 ltrim
max min nodes outdegree percentileDisc pi point pow properties radians
rand randomUUID range regex_matches relationships replace reverse right
round rtrim sign sin size split sqrt stDev startnode starts_with
string.join string.matchRegEx string.replaceRegEx substring sum tail tan
timestamp toBoolean toBooleanList toFloatList toIntegerList toStringList
tofloat tointeger tojson tolower tostring toupper trim type typeOf
vec.cosineDistance vec.euclideanDistance vecf32
""".split()

# reference names realized as expression operators / CASE / IS NULL /
# pattern predicates rather than callable functions (same split the
# reference's binder makes when it lowers operators to these functions)
OPERATOR_NAMES = {"add", "case", "contains", "starts_with", "ends_with",
                  "is_null", "regex_matches", "exists"}
AGGREGATE_NAMES = {"avg", "collect", "count", "max", "min",
                   "percentiledisc", "stdev", "sum"}


def test_all_reference_functions_resolve():
    from falkordb_tpu.runtime.functions import FUNCTIONS
    import falkordb_tpu.algos.procedures as APR
    import falkordb_tpu.index.procedures as IPR
    import falkordb_tpu.runtime.procedures as PR

    assert len(set(REFERENCE_FUNCTIONS)) == 128
    procs = set()
    for mod in (PR, IPR, APR):
        for ob in vars(mod).values():
            if isinstance(ob, dict):
                procs |= {str(k).lower() for k in ob
                          if isinstance(k, str) and "." in k}
    ours = {k.lower() for k in FUNCTIONS} | procs
    missing = [f for f in REFERENCE_FUNCTIONS
               if f.lower() not in ours
               and f.lower() not in OPERATOR_NAMES
               and f.lower() not in AGGREGATE_NAMES]
    assert missing == [], f"unresolved reference functions: {missing}"


@pytest.mark.parametrize("cypher,expect", [
    ("RETURN 1 + 2", 3),                       # add
    ("RETURN 'abc' CONTAINS 'b'", True),       # contains
    ("RETURN 'abc' STARTS WITH 'a'", True),
    ("RETURN 'abc' ENDS WITH 'c'", True),
    ("RETURN null IS NULL", True),
    ("RETURN 'abc' =~ 'a.c'", True),           # regex_matches
    ("RETURN CASE WHEN true THEN 1 ELSE 2 END", 1),
])
def test_operator_functions_work(cypher, expect):
    g = FalkorDB().select_graph("fnparity")
    assert g.query(cypher).result_set == [[expect]]


def test_aggregate_functions_work():
    g = FalkorDB().select_graph("fnparity_agg")
    r = g.query("UNWIND [1, 2, 3, 4] AS x RETURN sum(x), avg(x), min(x), "
                "max(x), count(x), collect(x), percentileDisc(x, 0.5), "
                "stDev(x)")
    row = r.result_set[0]
    assert row[:4] == [10, 2.5, 1, 4]
    assert row[4] == 4 and row[5] == [1, 2, 3, 4] and row[6] == 2
    assert abs(row[7] - 1.2909944) < 1e-6
