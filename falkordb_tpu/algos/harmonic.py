"""Harmonic centrality — sum of inverse distances via repeated algebraic BFS
(LAGraph harmonic role).  h(v) = Σ_{u≠v} 1/d(u,v) over INCOMING paths."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from falkordb_tpu.algos.bfs import bfs_levels
from falkordb_tpu.sparse.csr import CSR


def harmonic_centrality(a_csr: CSR):
    n = a_csr.n_rows
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    at = a_csr.transpose_host()
    out = np.zeros(n, dtype=np.float64)
    for s in range(n):
        levels = np.asarray(bfs_levels(at, s))
        reach = (levels > 0) & (levels < 2**30)
        # s reaches v at distance levels[v]; contributes to h(v)
        out[reach] += 1.0 / levels[reach]
    return out
