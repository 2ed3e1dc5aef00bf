"""Bench-as-test: a subset of the falkorbench-analogue query suite runs
in CI against a scaled-down corpus (reference pattern: the bench query
canon is importable data, bench/src/falkorbench/queries.py:1-10, and flow
tests execute it).  Wall-clock is evidence, not the gate (metrics.py:30
excludes ms from the gate) — the assertions here are correctness +
generous absolute sanity caps."""

import time

import pytest

import bench_queries as QB
from falkordb_tpu import FalkorDB

SUBSET = [
    "return_1", "arith_sum", "label_count", "index_seek", "range_filter",
    "order_by_limit", "expand_all", "two_hop", "varlen_1_3", "agg_sum",
    "group_by", "with_chain", "union", "fulltext_query", "vector_query",
    "create_delete_node", "merge_match", "foreach", "composite_index_seek",
]


@pytest.fixture(scope="module")
def g():
    g = FalkorDB().select_graph("qbench_ci")
    for q in QB.SETUP:
        # scale the 10K corpus down 10x for CI
        g.query(q.replace("range(0, 9999)", "range(0, 999)")
                 .replace("% 10000", "% 1000"))
    return g


def test_qbench_subset_runs(g):
    by_name = dict(QB.QUERIES)
    assert set(SUBSET) <= set(by_name), sorted(set(SUBSET) - set(by_name))
    for name in SUBSET:
        t0 = time.perf_counter()
        g.query(by_name[name])  # warm (parse+plan)
        g.query(by_name[name])
        dt = time.perf_counter() - t0
        assert dt < 5.0, f"{name} took {dt:.1f}s on the CI corpus"


def test_qbench_queries_all_named_uniquely():
    names = [n for n, _ in QB.QUERIES]
    assert len(names) == len(set(names))
    assert len(names) >= 75  # the suite must not silently shrink
