"""Harmonic centrality — batched multi-source algebraic BFS.

h(v) = Σ_{u≠v} 1/d(u→v) over INCOMING paths (LAGraph harmonic role,
/root/reference/graph/src/runtime/functions/algo_procedures.rs:40-52).
Sources run through the 64-lane packed BFS kernel (`bfs_multi`) in batches:
one edge pass serves 64 sources, amortizing the random row-gather that
dominates TPU traversal cost (PERF.md) — n/64 dispatch groups instead of n
sequential single-source runs."""

from __future__ import annotations

import numpy as np

from falkordb_tpu.algos.bfs import bfs_multi
from falkordb_tpu.sparse.csr import CSR

LANES = 64
UNREACHED = 2**30


def harmonic_centrality(a_csr: CSR):
    n = a_csr.n_rows
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    at = a_csr.transpose_host()
    out = np.zeros(n, dtype=np.float64)
    for lo in range(0, n, LANES):
        srcs = list(range(lo, min(lo + LANES, n)))
        levels = np.asarray(bfs_multi(at, srcs))  # (n, k) int32
        mask = (levels > 0) & (levels < UNREACHED)
        contrib = np.where(mask, 1.0 / np.maximum(levels, 1), 0.0)
        out += contrib.sum(axis=1)
    return out
