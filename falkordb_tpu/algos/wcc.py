"""Weakly connected components (LAGr_ConnectedComponents replacement).

Min-label propagation to fixpoint, jitted; expects the symmetrized CSR from
compact_adjacency(directed=False)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from falkordb_tpu.sparse.csr import CSR


from functools import partial


@partial(jax.jit, static_argnames=("n",))
def _wcc_jit(indptr, rows, cols, nnz, n):
    cap = cols.shape[0]
    valid = jnp.arange(cap, dtype=jnp.int32) < nnz
    BIG = jnp.int32(2**30)

    def cond(state):
        return state[1]

    def body(state):
        labels, _ = state
        gath = jnp.take(labels, cols, mode="clip")
        gath = jnp.where(valid, gath, BIG)
        best = jax.ops.segment_min(gath, rows, num_segments=n,
                                   indices_are_sorted=True)
        new = jnp.minimum(labels, best)
        return new, jnp.any(new != labels)

    labels0 = jnp.arange(n, dtype=jnp.int32)
    labels, _ = jax.lax.while_loop(cond, body, (labels0, jnp.bool_(True)))
    return labels


def wcc(sym_csr: CSR):
    n = sym_csr.n_rows
    if n == 0:
        return np.zeros(0, dtype=np.int32)
    return _wcc_jit(sym_csr.indptr, sym_csr.rows, sym_csr.cols, sym_csr.nnz, n)
