"""PageRank (LAGr_PageRank replacement) — jitted power iteration.

r ← (1-d)/n + d·(AᵀD⁻¹ r + dangling/n), edge-centric segment-sum per
iteration, fixed-point loop under jit with tolerance exit."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from falkordb_tpu.sparse.csr import CSR


@partial(jax.jit, static_argnames=("n", "max_iters"))
def _pagerank_jit(indptr, rows, cols, nnz, n, damping, tol, max_iters):
    """Runs on the FORWARD CSR (rows = src): out-degree from indptr; the
    per-iteration reduce scatters into dst (cols) — we instead run on AT
    outside.  Here rows must be dst-sorted (pass transpose arrays)."""
    cap = cols.shape[0]
    valid = jnp.arange(cap, dtype=jnp.int32) < nnz
    # out-degree of original graph = in-degree on AT columns
    ones = jnp.where(valid, 1.0, 0.0).astype(jnp.float32)
    outdeg = jax.ops.segment_sum(ones, cols, num_segments=n)  # deg of src side
    inv_out = jnp.where(outdeg > 0, 1.0 / outdeg, 0.0).astype(jnp.float32)
    dangling_mask = (outdeg == 0).astype(jnp.float32)

    def cond(state):
        r, prev, it = state
        err = jnp.sum(jnp.abs(r - prev))
        return jnp.logical_and(it < max_iters,
                               jnp.logical_or(it == 0, err > tol))

    def body(state):
        r, _, it = state
        contrib_per_src = r * inv_out
        gath = jnp.take(contrib_per_src, cols, mode="clip")
        gath = jnp.where(valid, gath, 0.0)
        acc = jax.ops.segment_sum(gath, rows, num_segments=n,
                                  indices_are_sorted=True)
        dangling = jnp.sum(r * dangling_mask) / n
        r_new = (1.0 - damping) / n + damping * (acc + dangling)
        return r_new.astype(jnp.float32), r, it + 1

    r0 = jnp.full(n, 1.0 / n, dtype=jnp.float32)
    r, _, _ = jax.lax.while_loop(cond, body, (r0, jnp.zeros_like(r0),
                                              jnp.int32(0)))
    return r


def pagerank(a_csr: CSR, damping=0.85, tol=1e-4, max_iters=100):
    at = a_csr.transpose_host()
    n = at.n_rows
    if n == 0:
        return np.zeros(0, dtype=np.float32)
    return _pagerank_jit(at.indptr, at.rows, at.cols, at.nnz, n,
                         jnp.float32(damping), jnp.float32(tol), max_iters)


@jax.jit
def _step_ell_pagerank(bucket_args, r, inv_out, dangling_mask, damping):
    n = r.shape[0]
    contrib = jnp.concatenate([r * inv_out, jnp.zeros(1, jnp.float32)])
    acc = jnp.zeros(n + 1, dtype=jnp.float32)
    for node_ids, cols in bucket_args:
        gat = jnp.take(contrib, cols, axis=0, mode="clip")  # (rows, w)
        acc = acc.at[node_ids].set(jnp.sum(gat, axis=1))
    dangling = jnp.sum(r * dangling_mask) / n
    return ((1.0 - damping) / n
            + damping * (acc[:n] + dangling)).astype(jnp.float32)


def pagerank_ell(ell, outdeg, damping=0.85, tol=1e-4, max_iters=100):
    """PageRank over the blocked-ELL TRANSPOSE adjacency: the per-node
    in-neighbor sum is a DENSE reduce over each bucket's width axis — no
    scatter/segment ops (the scatter-free SpMV; see sparse/ell.py).

    ell    — BlockedEll of the transpose (rows = dst, neighbor lists = srcs)
    outdeg — (n,) out-degrees of the ORIGINAL graph
    """
    n = ell.n
    outdeg = np.asarray(outdeg, dtype=np.float32)
    inv_out = jnp.asarray(
        np.where(outdeg > 0, 1.0 / np.maximum(outdeg, 1), 0.0))
    dangling_mask = jnp.asarray((outdeg == 0).astype(np.float32))
    # bucket arrays pass as jit arguments to the module-level step —
    # closures would bake them into the executable as huge constants
    # (slow remote compiles) and a per-call inner jit would never reuse
    # the compiled program across pagerank_ell invocations
    args_t = tuple((b.node_ids, b.cols) for b in ell.buckets)

    r = jnp.full(n, 1.0 / n, dtype=jnp.float32)
    damping = jnp.float32(damping)
    for _ in range(max_iters):
        r2 = _step_ell_pagerank(args_t, r, inv_out, dangling_mask, damping)
        if float(jnp.sum(jnp.abs(r2 - r))) <= tol:
            r = r2
            break
        r = r2
    return r
