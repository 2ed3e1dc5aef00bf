"""Betweenness centrality — Brandes via BFS waves (LAGr_Betweenness role).

Forward sweep: per-level path counts sigma via plus_times frontier products;
backward sweep: dependency accumulation per level.  Levels run on device;
the level loop is host-driven (bounded by graph diameter)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from falkordb_tpu.sparse.csr import CSR


def _edge_arrays(at: CSR):
    cap = at.cols.shape[0]
    valid = np.arange(cap) < int(at.nnz)
    return np.asarray(at.rows), np.asarray(at.cols), valid


from functools import partial


@partial(jax.jit, static_argnames=("n",))
def _push_counts(rowsd, colsd, validd, sigma_frontier, n):
    g = jnp.take(sigma_frontier, colsd, mode="clip")
    g = jnp.where(validd, g, 0.0)
    return jax.ops.segment_sum(g, rowsd, num_segments=n,
                               indices_are_sorted=True)


@partial(jax.jit, static_argnames=("n",))
def _pull_deps(rowsd_f, colsd_f, validd_f, coef, n):
    # forward CSR (rows=src, cols=dst): dep gather from dst side
    g = jnp.take(coef, colsd_f, mode="clip")
    g = jnp.where(validd_f, g, 0.0)
    return jax.ops.segment_sum(g, rowsd_f, num_segments=n,
                               indices_are_sorted=True)


def betweenness(a_csr: CSR, sampling_size=None, seed=0, normalized=False):
    n = a_csr.n_rows
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    at = a_csr.transpose_host()
    rows_t = at.rows
    cols_t = at.cols
    valid_t = jnp.arange(at.cap, dtype=jnp.int32) < at.nnz
    rows_f = a_csr.rows
    cols_f = a_csr.cols
    valid_f = jnp.arange(a_csr.cap, dtype=jnp.int32) < a_csr.nnz

    if sampling_size is not None and sampling_size < n:
        rng = np.random.default_rng(seed)
        sources = rng.choice(n, size=sampling_size, replace=False)
    else:
        sources = np.arange(n)

    bc = np.zeros(n, dtype=np.float64)
    for s in sources:
        # forward BFS with sigma
        levels = np.full(n, -1, dtype=np.int64)
        sigma = np.zeros(n, dtype=np.float64)
        levels[s] = 0
        sigma[s] = 1.0
        frontiers = []
        frontier = np.zeros(n, dtype=np.float32)
        frontier[s] = sigma[s]
        depth = 0
        while True:
            counts = np.asarray(_push_counts(rows_t, cols_t, valid_t,
                                             jnp.asarray(frontier), n))
            fresh = (levels < 0) & (counts > 0)
            if not fresh.any():
                break
            depth += 1
            levels[fresh] = depth
            sigma[fresh] = counts[fresh]
            frontiers.append(np.nonzero(fresh)[0])
            frontier = np.where(fresh, counts, 0.0).astype(np.float32)
        # backward accumulation
        delta = np.zeros(n, dtype=np.float64)
        for lvl in range(depth, 0, -1):
            wset = (levels == lvl)
            coef = np.where(wset, (1.0 + delta) / np.maximum(sigma, 1e-300),
                            0.0).astype(np.float32)
            acc = np.asarray(_pull_deps(rows_f, cols_f, valid_f,
                                        jnp.asarray(coef), n))
            prev = (levels == lvl - 1)
            delta[prev] += sigma[prev] * acc[prev]
        delta[s] = 0.0
        bc += delta
    if sampling_size is not None and sampling_size < n:
        bc *= n / float(sampling_size)
    if normalized and n > 2:
        bc /= (n - 1) * (n - 2)
    return bc
