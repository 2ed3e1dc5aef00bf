"""Blocked-ELL adjacency — the dense-reduce sparse format (SURVEY.md §7.1).

Nodes are partitioned into degree buckets; each bucket stores its nodes'
edge lists in a dense (rows, width) matrix padded with a sentinel index.
Per-node semiring reductions become DENSE reductions over the width axis —
pure VPU work with zero scatter — at ≤2× edge padding.  This is the hot
format for whole-graph algorithms (BFS/PageRank); CSR stays the
traversal/query format.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass
class EllBucket:
    node_ids: jnp.ndarray  # (rows,) int32 — node owning each row
    cols: jnp.ndarray  # (rows, width) int32 — neighbor ids, sentinel = n
    width: int


@dataclasses.dataclass
class BlockedEll:
    n: int
    sentinel: int  # = n (gather tables carry one extra zero row)
    buckets: list
    padded_edges: int
    true_edges: int


def build_blocked_ell(indptr: np.ndarray, cols: np.ndarray, n: int,
                      widths=(8, 32, 128, 512, 4096, 32768)) -> BlockedEll:
    """Build from CSR arrays (host).  Rows with degree beyond the largest
    width get a final bucket sized to the max degree (power-law hubs)."""
    indptr = np.asarray(indptr)
    cols = np.asarray(cols)
    deg = indptr[1:] - indptr[:-1]
    max_deg = int(deg.max()) if n else 0
    ws = [w for w in widths if w < max_deg] + ([max_deg] if max_deg else [])
    buckets = []
    padded = 0
    lo = 0
    for w in ws:
        sel = np.nonzero((deg > lo) & (deg <= w))[0]
        lo = w
        if len(sel) == 0:
            continue
        rows = len(sel)
        mat = np.full((rows, w), n, dtype=np.int32)
        # vectorized fill: scatter each node's CSR slice into its row
        dsel = deg[sel]
        total = int(dsel.sum())
        rep_rows = np.repeat(np.arange(rows), dsel)
        seg_starts = np.repeat(np.cumsum(dsel) - dsel, dsel)
        within = np.arange(total) - seg_starts
        src_pos = np.repeat(indptr[sel], dsel) + within
        mat[rep_rows, within] = cols[src_pos]
        padded += rows * w
        buckets.append(EllBucket(jnp.asarray(sel.astype(np.int32)),
                                 jnp.asarray(mat), w))
    return BlockedEll(n, n, buckets, padded, int(deg.sum()))
