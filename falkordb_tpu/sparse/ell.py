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
    row_offset: int = -1  # set when node_ids are a contiguous range (sorted)


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


def degree_sort_permutation(indptr: np.ndarray) -> np.ndarray:
    """perm[new_id] = old_id ordering nodes by degree descending.

    Relabeling a graph with this permutation makes every degree bucket a
    CONTIGUOUS id range, so the per-level "reach" of blocked-ELL kernels is
    a concatenation of per-bucket dense reduces — zero scatter (the v5e
    scatter path is 10-50x behind streaming, PERF.md).  It also clusters
    the hub rows that dominate gather traffic."""
    indptr = np.asarray(indptr)
    deg = indptr[1:] - indptr[:-1]
    return np.argsort(-deg, kind="stable").astype(np.int64)


# Width ladder: ~1.2x ratio above 16 (multiples of bfs_packed.VW=16 so
# the packed virtual-row path adds no re-padding), every even step below.
# vs the old power-of-2 ladder this cuts RMAT edge padding 1.44x -> ~1.20x
# (measured scale 22/24) — early BFS levels are gather-bound in PADDED
# rows, so the cut is a direct GTEPS multiplier (PERF.md r4).
SORTED_WIDTHS = ((2, 3, 4, 5, 6, 8, 10, 12, 14, 16)
                 + tuple(16 * k for k in
                         (2, 3, 4, 5, 6, 8, 10, 12, 14, 16, 20, 24, 28, 32,
                          40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                          256, 320, 384, 448, 512, 640, 768, 896, 1024,
                          1280, 1536, 1792, 2048, 2560, 3072, 4096, 6144,
                          8192)))


def build_blocked_ell_sorted(indptr: np.ndarray, cols: np.ndarray, n: int,
                             widths=SORTED_WIDTHS,
                             device: bool = True) -> BlockedEll:
    """Blocked-ELL over a degree-DESC-sorted id space: bucket b covers rows
    [row_offset, row_offset+rows) in node-id order (widths descending).
    Requires the CSR to already be relabeled by `degree_sort_permutation`.
    Zero-degree tail rows get no bucket (their reach is identically 0).
    device=False keeps buckets as host numpy (cache-building processes
    must not touch the single-holder TPU relay)."""
    put = jnp.asarray if device else (lambda x: x)
    indptr = np.asarray(indptr)
    cols = np.asarray(cols)
    deg = indptr[1:] - indptr[:-1]
    if n > 1:
        assert (deg[:-1] >= deg[1:]).all(), "ids must be degree-sorted desc"
    max_deg = int(deg.max()) if n else 0
    ws = [w for w in widths if w < max_deg] + ([max_deg] if max_deg else [])
    ws = sorted(ws, reverse=True)  # descending width = ascending node id

    # first id with deg <= w (degrees are non-increasing)
    def first_le(w):
        return int(np.searchsorted(-deg, -w, side="left"))

    out = []
    padded = 0
    ranges = []
    for i, w in enumerate(ws):
        start = first_le(w) if i else 0
        stop = first_le(ws[i + 1]) if i + 1 < len(ws) else first_le(0)
        ranges.append((w, start, stop))
    for w, start, stop in ranges:
        rows = stop - start
        if rows <= 0:
            continue
        mat = np.full((rows, w), n, dtype=np.int32)
        dsel = deg[start:stop]
        total = int(dsel.sum())
        rep_rows = np.repeat(np.arange(rows), dsel)
        seg_starts = np.repeat(np.cumsum(dsel) - dsel, dsel)
        within = np.arange(total) - seg_starts
        src_pos = np.repeat(indptr[start:stop], dsel) + within
        mat[rep_rows, within] = cols[src_pos]
        padded += rows * w
        out.append(EllBucket(
            put(np.arange(start, stop, dtype=np.int32)),
            put(mat), w, row_offset=start))
    return BlockedEll(n, n, out, padded, int(deg.sum()))
