"""Single-source shortest paths — min-plus semiring Bellman-Ford iterations
to fixpoint (the reference's algo.SPpaths Dijkstra role for non-negative
weights; algebraic min-plus parallelizes on TPU where heap-based Dijkstra
does not)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from falkordb_tpu.sparse.csr import CSR


from functools import partial


@partial(jax.jit, static_argnames=("n",))
def _sssp_jit(indptr, rows, cols, vals, nnz, n, src):
    """Expects TRANSPOSE CSR with float32 weights (rows = dst)."""
    cap = cols.shape[0]
    valid = jnp.arange(cap, dtype=jnp.int32) < nnz
    INF = jnp.float32(jnp.inf)
    w = vals.astype(jnp.float32)

    def cond(state):
        return state[1]

    def body(state):
        dist, _ = state
        gath = jnp.take(dist, cols, mode="clip") + w
        gath = jnp.where(valid, gath, INF)
        best = jax.ops.segment_min(gath, rows, num_segments=n,
                                   indices_are_sorted=True)
        new = jnp.minimum(dist, best)
        return new, jnp.any(new < dist)

    d0 = jnp.full(n, INF, dtype=jnp.float32).at[src].set(0.0)
    dist, _ = jax.lax.while_loop(cond, body, (d0, jnp.bool_(True)))
    return dist


def sssp(a_csr: CSR, src: int):
    if src < 0:
        return np.full(a_csr.n_rows, np.inf, dtype=np.float32)
    at = a_csr.transpose_host()
    vals = at.vals if at.vals is not None else jnp.ones(at.cap, jnp.float32)
    return _sssp_jit(at.indptr, at.rows, at.cols, vals, at.nnz, at.n_rows,
                     src)
