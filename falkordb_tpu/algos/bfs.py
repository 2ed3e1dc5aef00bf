"""Algebraic BFS — direction-agnostic push BFS as jitted semiring iterations.

The LAGr_BFS replacement and the headline benchmark kernel (BASELINE.md:
≥10 GTEPS/chip target).  Formulation: frontier f (int32 0/1 over nodes),
next = (AT ⊕.⊗ f) ∧ ¬visited under the or/pair semiring — one sorted
segment-reduce per level, all edges touched per level (edge-centric,
static shapes, no host round-trips inside the loop)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from falkordb_tpu.sparse.csr import CSR

UNREACHED = jnp.int32(2**30)


@partial(jax.jit, static_argnames=("n", "max_depth"))
def _bfs_jit(indptr, rows, cols, nnz, n, src, max_depth):
    """Runs on AT (transpose): rows are destinations' in-edges sorted by dst.
    Actually: pass the transpose CSR so mxv gives push-BFS with a SORTED
    segment reduce (the fast path on TPU)."""
    cap = cols.shape[0]
    valid = jnp.arange(cap, dtype=jnp.int32) < nnz

    def cond(state):
        levels, frontier, depth, active = state
        return active

    def body(state):
        levels, frontier, depth, _ = state
        fg = jnp.take(frontier, cols, mode="clip")  # gather f[src] per edge
        contrib = jnp.where(valid, fg, 0)
        nxt = jax.ops.segment_max(contrib, rows, num_segments=n,
                                  indices_are_sorted=True)
        nxt = jnp.maximum(nxt, 0)
        nxt = jnp.where(levels == UNREACHED, nxt, 0)
        levels = jnp.where(nxt > 0, depth + 1, levels)
        active = jnp.any(nxt > 0)
        if max_depth is not None:
            active = jnp.logical_and(active, depth + 1 < max_depth)
        return levels, nxt, depth + 1, active

    levels0 = jnp.full(n, UNREACHED, dtype=jnp.int32)
    levels0 = levels0.at[src].set(0)
    f0 = jnp.zeros(n, dtype=jnp.int32).at[src].set(1)
    levels, _, _, _ = jax.lax.while_loop(
        cond, body, (levels0, f0, jnp.int32(0), jnp.bool_(True)))
    return levels


@partial(jax.jit, static_argnames=("n",))
def _bfs_parents_jit(indptr, rows, cols, nnz, n, src):
    """Levels + parent vector via a min_second-style propagation."""
    cap = cols.shape[0]
    valid = jnp.arange(cap, dtype=jnp.int32) < nnz
    BIG = jnp.int32(2**30)

    def cond(state):
        return state[3]

    def body(state):
        levels, parents, frontier, _, depth = state
        fg = jnp.take(frontier, cols, mode="clip")
        active_edge = jnp.logical_and(valid, fg > 0)
        # candidate parent per edge = source node id (cols index of AT = src)
        cand = jnp.where(active_edge, cols, BIG)
        best = jax.ops.segment_min(cand, rows, num_segments=n,
                                   indices_are_sorted=True)
        reached = best < BIG
        fresh = jnp.logical_and(reached, levels == BIG)
        levels = jnp.where(fresh, depth + 1, levels)
        parents = jnp.where(fresh, best, parents)
        nf = fresh.astype(jnp.int32)
        return levels, parents, nf, jnp.any(fresh), depth + 1

    levels0 = jnp.full(n, BIG, dtype=jnp.int32).at[src].set(0)
    parents0 = jnp.full(n, -1, dtype=jnp.int32).at[src].set(src)
    f0 = jnp.zeros(n, dtype=jnp.int32).at[src].set(1)
    levels, parents, _, _, _ = jax.lax.while_loop(
        cond, body, (levels0, parents0, f0, jnp.bool_(True), jnp.int32(0)))
    return levels, parents


@partial(jax.jit, static_argnames=("n", "k", "max_depth"))
def _bfs_multi_jit(rows, cols, nnz, n, k, srcs, max_depth):
    """k-lane batched BFS (multi-source), one jit dispatch.

    The DB workload batches read queries into one device program
    (SURVEY.md §2.3 item 2); batching BFS lanes amortizes the per-edge
    random row fetch — the dominant cost on TPU (~3.5 ns/row for 64 B rows
    vs ~9.4 ns/element scalar, measured on v5e) — across k traversals.
    The per-level reduce is a row-wise sorted segment_max over int8 lanes.

    rows/cols — dst-sorted CSR-T expanded arrays (rows=dst, cols=src)
    srcs      — (k,) int32 BFS roots
    """
    cap = cols.shape[0]
    valid = jnp.arange(cap, dtype=jnp.int32) < nnz

    lane = jnp.arange(k, dtype=jnp.int32)
    f0 = jnp.zeros((n, k), dtype=jnp.int8).at[srcs, lane].set(1)
    levels0 = jnp.full((n, k), UNREACHED, dtype=jnp.int32)
    levels0 = levels0.at[srcs, lane].set(0)

    def cond(state):
        return state[2]

    def body(state):
        levels, frontier, _, depth = state
        C = jnp.take(frontier, cols, axis=0, mode="clip")  # (cap,k) HOT gather
        C = jnp.where(valid[:, None], C, 0)
        reach = jax.ops.segment_max(C, rows, num_segments=n,
                                    indices_are_sorted=True)
        reach = jnp.maximum(reach, 0)
        fresh = jnp.logical_and(reach > 0, levels == UNREACHED)
        levels = jnp.where(fresh, depth + 1, levels)
        nf = fresh.astype(jnp.int8)
        active = jnp.any(fresh)
        if max_depth is not None:
            active = jnp.logical_and(active, depth + 1 < max_depth)
        return levels, nf, active, depth + 1

    levels, _, _, _ = jax.lax.while_loop(
        cond, body, (levels0, f0, jnp.bool_(True), jnp.int32(0)))
    return levels


def bfs_multi(at_csr: CSR, sources, max_depth=None):
    """Batched BFS from `sources` (list of node ids) over the transpose CSR.
    Returns (n, k) int32 levels (UNREACHED where not found)."""
    srcs = np.asarray(sources, dtype=np.int32)
    return _bfs_multi_jit(
        at_csr.rows, at_csr.cols, at_csr.nnz, at_csr.n_rows, len(srcs),
        jnp.asarray(srcs), max_depth)


@partial(jax.jit, static_argnames=("n",), donate_argnums=(3, 4))
def _bfs_level_step(rows, cols, valid, frontier, levels, depth_arr, n):
    """One BFS level (k lanes).  Small program → fast XLA compile; the
    host drives the level loop (bfs_multi_stepped)."""
    depth = depth_arr
    C = jnp.take(frontier, cols, axis=0, mode="clip")
    C = jnp.where(valid[:, None], C, 0)
    reach = jax.ops.segment_max(C, rows, num_segments=n,
                                indices_are_sorted=True)
    reach = jnp.maximum(reach, 0)
    fresh = jnp.logical_and(reach > 0, levels == UNREACHED)
    levels = jnp.where(fresh, depth + 1, levels)
    nf = fresh.astype(jnp.int8)
    return levels, nf, jnp.any(fresh)


def bfs_multi_stepped(at_csr: CSR, sources, max_depth=None):
    """bfs_multi with a host-driven level loop: trades ~1 host round-trip
    per level for a ~10x smaller XLA program (fast first-compile — matters
    for cold benchmark processes through the remote-compile relay)."""
    srcs = np.asarray(sources, dtype=np.int32)
    k = len(srcs)
    n = at_csr.n_rows
    lane = np.arange(k)
    levels = np.full((n, k), 2**30, dtype=np.int32)
    frontier = np.zeros((n, k), dtype=np.int8)
    levels[srcs, lane] = 0
    frontier[srcs, lane] = 1
    valid = jnp.arange(at_csr.cap, dtype=jnp.int32) < at_csr.nnz
    levels_d = jnp.asarray(levels)
    frontier_d = jnp.asarray(frontier)
    depth = 0
    while True:
        levels_d, frontier_d, any_fresh = _bfs_level_step(
            at_csr.rows, at_csr.cols, valid, frontier_d, levels_d,
            jnp.int32(depth), n)
        depth += 1
        if not bool(any_fresh):
            break
        if max_depth is not None and depth >= max_depth:
            break
    return levels_d


# ---------------------------------------------------------------------------
# ELL bit-packed batched BFS — the performance path.
#
# Frontier is (n+1, W) int32 with 32 BFS lanes per word (bit-packed); the
# per-level step gathers neighbor frontier words through the blocked-ELL
# matrices and OR-reduces DENSELY over each bucket's width axis — no
# scatter/segment ops anywhere (v5e measurements: random row gather
# ~2-3 ns/row, any XLA scatter/segment path 10-50x slower).
# ---------------------------------------------------------------------------


def _make_ell_level_fn(ell, W, max_depth):
    # bucket arrays pass as jit arguments — closures would bake them into
    # the executable as huge constants (slow remote compiles, no reuse)
    args_t = tuple((b.node_ids, b.cols) for b in ell.buckets)
    n = ell.n

    @jax.jit
    def level_ell_bfs(bucket_args, visited, frontier, levels, depth):
        # frontier/visited: (n+1, W) int32 packed; row n = sentinel zeros
        reach = jnp.zeros((n + 1, W), dtype=jnp.int32)
        for node_ids, cols in bucket_args:
            gat = jnp.take(frontier, cols, axis=0, mode="clip")  # (r,w,W)
            orred = jax.lax.reduce(
                gat, jnp.int32(0),
                lambda a, b: jax.lax.bitwise_or(a, b), (1,))
            reach = reach.at[node_ids].set(orred)
        fresh = jnp.bitwise_and(reach, jnp.bitwise_not(visited))
        fresh = fresh.at[n].set(0)
        visited2 = jnp.bitwise_or(visited, fresh)
        # unpack fresh bits into per-lane levels — one vectorized expression
        k = levels.shape[1]
        lanes = jnp.arange(k, dtype=jnp.int32)
        words = jnp.take(fresh[:n], lanes // 32, axis=1)  # (n, k)
        bits = jnp.bitwise_and(jnp.right_shift(words, lanes % 32), 1)
        lvl = jnp.where((bits > 0) & (levels == UNREACHED), depth + 1, levels)
        any_fresh = jnp.any(fresh != 0)
        return visited2, fresh, lvl, any_fresh

    return lambda v, f, lv, d: level_ell_bfs(args_t, v, f, lv, d)


def bfs_multi_ell(ell, sources, max_depth=None):
    """Batched BFS over a BlockedEll transpose adjacency; 32*W lanes.
    Host-driven level loop (one jit per level), packed-bit frontiers."""
    k = len(sources)
    W = (k + 31) // 32
    n = ell.n
    visited = np.zeros((n + 1, W), dtype=np.int32)
    levels = np.full((n, k), 2**30, dtype=np.int32)
    for lane, s in enumerate(sources):
        # bit 31 overflows signed int32 — go through uint32 view
        visited.view(np.uint32)[int(s), lane // 32] |= np.uint32(
            1 << (lane % 32))
        levels[int(s), lane] = 0
    frontier = visited.copy()
    frontier[n] = 0
    visited_d = jnp.asarray(visited)
    frontier_d = jnp.asarray(frontier)
    levels_d = jnp.asarray(levels)
    step = _make_ell_level_fn(ell, W, max_depth)
    depth = 0
    while True:
        visited_d, frontier_d, levels_d, any_fresh = step(
            visited_d, frontier_d, levels_d, jnp.int32(depth))
        depth += 1
        if not bool(any_fresh):
            break
        if max_depth is not None and depth >= max_depth:
            break
    return levels_d


# ---------------------------------------------------------------------------
# Sorted blocked-ELL bit-packed BFS — the headline kernel.
#
# Requires a degree-DESC-relabeled transpose adjacency
# (sparse/ell.py build_blocked_ell_sorted): every bucket is a contiguous id
# range, so the per-level reach is a CONCAT of per-bucket dense OR-reduces —
# no scatter and no segment ops at all.  Levels stay int8 (RMAT diameters
# are tiny) and are updated by a shift-broadcast unpack (n,W,32)→(n,k), not
# a gather.  Per-level traffic = m×W×4 B gather + O(n×(W×4+k)) streaming.
# ---------------------------------------------------------------------------

UNREACHED8 = jnp.int8(127)


def _ell_reach(bucket_args, frontier, n, W):
    """(n, W) packed OR of neighbor frontier words, by concat of buckets."""
    parts = []
    covered = 0
    for row_offset, cols in bucket_args:
        gat = jnp.take(frontier, cols, axis=0, mode="clip")  # (r, w, W)
        parts.append(jax.lax.reduce(
            gat, jnp.int32(0), jax.lax.bitwise_or, (1,)))
        covered = row_offset + cols.shape[0]
    if covered < n:
        parts.append(jnp.zeros((n - covered, W), dtype=jnp.int32))
    return jnp.concatenate(parts, axis=0)


def _unpack_bits(words, k):
    """(n, W) int32 → (n, k) int8 0/1 without gathers (broadcast + shift)."""
    n, W = words.shape
    shifts = jnp.arange(32, dtype=jnp.int32)
    bits = jnp.bitwise_and(
        jnp.right_shift(words[:, :, None], shifts[None, None, :]), 1)
    return bits.reshape(n, W * 32)[:, :k].astype(jnp.int8)


def _make_sorted_level_fn(ell, W, k):
    offsets = tuple(int(b.row_offset) for b in ell.buckets)
    cols_t = tuple(b.cols for b in ell.buckets)
    n = ell.n

    @partial(jax.jit, donate_argnums=(1, 3))
    def level_sorted_bfs(cols_t, visited, frontier, levels, depth):
        bucket_args = list(zip(offsets, cols_t))
        # visited/frontier: (n+1, W) int32 packed; levels: (n, k) int8
        reach = _ell_reach(bucket_args, frontier, n, W)
        fresh = jnp.bitwise_and(reach, jnp.bitwise_not(visited[:n]))
        visited = visited.at[:n].set(jnp.bitwise_or(visited[:n], fresh))
        frontier = jnp.concatenate(
            [fresh, jnp.zeros((1, W), jnp.int32)], axis=0)
        bits = _unpack_bits(fresh, k)
        levels = jnp.where((bits > 0) & (levels == UNREACHED8),
                           depth.astype(jnp.int8) + 1, levels)
        return visited, frontier, levels, jnp.any(fresh != 0)

    return lambda v, f, lv, d: level_sorted_bfs(cols_t, v, f, lv, d)


def _make_sorted_fused_fn(ell, W, k, max_levels=64):
    offsets = tuple(int(b.row_offset) for b in ell.buckets)
    cols_t = tuple(b.cols for b in ell.buckets)
    n = ell.n

    @partial(jax.jit, donate_argnums=(1, 2, 3))
    def run_sorted_bfs(cols_t, visited, frontier, levels):
        bucket_args = list(zip(offsets, cols_t))

        def cond(state):
            return state[4]

        def body(state):
            visited, frontier, levels, depth, _ = state
            reach = _ell_reach(bucket_args, frontier, n, W)
            fresh = jnp.bitwise_and(reach, jnp.bitwise_not(visited[:n]))
            visited = visited.at[:n].set(jnp.bitwise_or(visited[:n], fresh))
            frontier = jnp.concatenate(
                [fresh, jnp.zeros((1, W), jnp.int32)], axis=0)
            bits = _unpack_bits(fresh, k)
            levels = jnp.where((bits > 0) & (levels == UNREACHED8),
                               depth.astype(jnp.int8) + 1, levels)
            active = jnp.logical_and(jnp.any(fresh != 0),
                                     depth + 1 < max_levels)
            return visited, frontier, levels, depth + 1, active

        state = (visited, frontier, levels, jnp.int32(0), jnp.bool_(True))
        visited, _, levels, _, _ = jax.lax.while_loop(cond, body, state)
        return visited, levels

    return lambda v, f, lv: run_sorted_bfs(cols_t, v, f, lv)


def _packed_init(n, sources):
    k = len(sources)
    W = (k + 31) // 32
    visited = np.zeros((n + 1, W), dtype=np.int32)
    levels = np.full((n, k), 127, dtype=np.int8)
    for lane, s in enumerate(sources):
        visited.view(np.uint32)[int(s), lane // 32] |= np.uint32(
            1 << (lane % 32))
        levels[int(s), lane] = 0
    frontier = visited.copy()
    frontier[n] = 0
    return W, visited, frontier, levels


def bfs_multi_ell_sorted(ell, sources, fused=True, max_depth=None):
    """Batched BFS over a SORTED BlockedEll transpose adjacency (32*W lanes).

    fused=True: the whole level loop is one lax.while_loop dispatch (no
    host round-trips; big first compile, persistent-cached).  fused=False:
    host-driven levels (small program, ~1 sync/level).
    Returns (visited_packed (n+1,W) int32, levels (n,k) int8 [127=unreached]).
    """
    n = ell.n
    W, visited, frontier, levels = _packed_init(n, sources)
    k = len(sources)
    visited_d = jnp.asarray(visited)
    frontier_d = jnp.asarray(frontier)
    levels_d = jnp.asarray(levels)
    if fused:
        run = _make_sorted_fused_fn(ell, W, k,
                                    max_levels=max_depth or 64)
        return run(visited_d, frontier_d, levels_d)
    step = _make_sorted_level_fn(ell, W, k)
    depth = 0
    while True:
        visited_d, frontier_d, levels_d, any_fresh = step(
            visited_d, frontier_d, levels_d, jnp.int32(depth))
        depth += 1
        if not bool(any_fresh):
            break
        if max_depth is not None and depth >= max_depth:
            break
    return visited_d, levels_d


# ---------------------------------------------------------------------------
# Fully-packed batched BFS with fresh-history — the bench kernel.
#
# v5e gather-curve measurement (scripts/prof_gather_curve.py): per-row
# gather cost grows ~1.9x from 8 B to 256 B rows (6 -> 11 ns/row), so wide
# lane counts are nearly free: W=64 (2048 lanes) maximizes GTEPS.  At that
# width the in-loop per-lane level unpack would dominate, so the kernel
# keeps EVERYTHING packed: per level it appends the fresh bitmask to a
# (max_levels, n, W) history; levels are derived lazily per lane
# (`unpack_levels`) — each (node, lane) flips in exactly one fresh_d.
# ---------------------------------------------------------------------------


def _make_packed_fused_fn(ell, W, max_levels):
    # bucket cols pass as jit ARGUMENTS (not closures): closed-over device
    # arrays bake the graph into the executable as 100MB-class constants —
    # slow to compile through the remote-compile relay and uncacheable
    # across graphs.  Offsets stay static (they shape the concat).
    offsets = tuple(int(b.row_offset) for b in ell.buckets)
    cols_t = tuple(b.cols for b in ell.buckets)
    n = ell.n

    @partial(jax.jit, donate_argnums=(1, 2, 3))
    def run_packed_bfs(cols_t, visited, frontier, hist):
        bucket_args = list(zip(offsets, cols_t))

        def cond(state):
            return state[4]

        def body(state):
            visited, frontier, hist, depth, _ = state
            reach = _ell_reach(bucket_args, frontier, n, W)
            fresh = jnp.bitwise_and(reach, jnp.bitwise_not(visited[:n]))
            visited = visited.at[:n].set(jnp.bitwise_or(visited[:n], fresh))
            frontier = jnp.concatenate(
                [fresh, jnp.zeros((1, W), jnp.int32)], axis=0)
            hist = jax.lax.dynamic_update_slice(
                hist, fresh[None], (depth, jnp.int32(0), jnp.int32(0)))
            active = jnp.logical_and(jnp.any(fresh != 0),
                                     depth + 1 < max_levels)
            return visited, frontier, hist, depth + 1, active

        state = (visited, frontier, hist, jnp.int32(0), jnp.bool_(True))
        visited, frontier, hist, depth, _ = jax.lax.while_loop(
            cond, body, state)
        return visited, frontier, hist, depth

    return lambda v, f, h: run_packed_bfs(cols_t, v, f, h)


def _make_packed_level_fn(ell, W):
    offsets = tuple(int(b.row_offset) for b in ell.buckets)
    cols_t = tuple(b.cols for b in ell.buckets)
    n = ell.n

    @partial(jax.jit, donate_argnums=(1,))
    def step_packed_bfs(cols_t, visited, frontier):
        bucket_args = list(zip(offsets, cols_t))
        reach = _ell_reach(bucket_args, frontier, n, W)
        fresh = jnp.bitwise_and(reach, jnp.bitwise_not(visited[:n]))
        visited = visited.at[:n].set(jnp.bitwise_or(visited[:n], fresh))
        frontier = jnp.concatenate(
            [fresh, jnp.zeros((1, W), jnp.int32)], axis=0)
        return visited, frontier, jnp.any(fresh != 0)

    return lambda v, f: step_packed_bfs(cols_t, v, f)


class PackedBfsResult:
    """Packed multi-source BFS output: visited bitmasks + per-level fresh
    history.  Levels unpack lazily per lane (the result of 2048 BFS lanes
    as one (n, k) int array would be GBs; queries want one lane)."""

    def __init__(self, visited, hist, nlevels, sources):
        self.visited = visited  # (n+1, W) int32 packed
        self.hist = hist  # (nlevels, n, W) int32 packed fresh-per-level
        self.nlevels = nlevels
        self.sources = list(sources)

    def levels_for_lane(self, lane: int):
        """(n,) int32 levels for one source (UNREACHED where not found)."""
        word, bit = lane // 32, lane % 32
        h = self.hist[: self.nlevels, :, word]
        bits = jnp.bitwise_and(jnp.right_shift(h, bit), 1)  # (L, n)
        depth = jnp.arange(1, self.nlevels + 1, dtype=jnp.int32)[:, None]
        lv = jnp.sum(bits * depth, axis=0)  # flips in exactly one level
        lv = jnp.where(lv == 0, UNREACHED, lv)  # hist[d] holds depth d+1
        return lv.at[self.sources[lane]].set(0)  # root visits at init

    def reached_counts(self):
        """(k,) number of reached nodes per lane (popcount of visited)."""
        return self.weighted_counts(None)

    def weighted_counts(self, weights):
        """(k,) sum of `weights` over reached nodes per lane (None = count).
        Graph500 kernel-2 edge counting: pass outdeg to get traversed
        edges.  Unpacks in 8-word (256-lane) chunks to bound memory."""
        k = len(self.sources)
        W = self.visited.shape[1]
        n = self.visited.shape[0] - 1
        shifts = jnp.arange(32, dtype=jnp.int32)
        w = None if weights is None else \
            jnp.asarray(weights, dtype=jnp.float32)

        @jax.jit
        def chunk(words):
            bits = jnp.bitwise_and(
                jnp.right_shift(words[:, :, None], shifts[None, None, :]), 1)
            bits = bits.reshape(n, words.shape[1] * 32).astype(jnp.float32)
            if w is None:
                return jnp.sum(bits, axis=0)
            return jnp.einsum("nk,n->k", bits, w)

        outs = []
        for lo in range(0, W, 8):
            outs.append(chunk(self.visited[:n, lo: lo + 8]))
        return jnp.concatenate(outs)[:k]


def bfs_multi_ell_packed(ell, sources, max_levels=16, fused=True):
    """2048-lane-class batched BFS over a SORTED BlockedEll transpose.

    fused=True runs up to `max_levels` levels per dispatch in one
    lax.while_loop; the host continues with fresh dispatches for deeper
    graphs (diameter/max_levels syncs total).  Returns PackedBfsResult.
    """
    n = ell.n
    k = len(sources)
    W, visited, frontier, _ = _packed_init(n, sources)
    visited_d = jnp.asarray(visited)
    frontier_d = jnp.asarray(frontier)
    hists = []
    total_levels = 0
    if fused:
        run = _make_packed_fused_fn(ell, W, max_levels)
        while True:
            hist = jnp.zeros((max_levels, n, W), dtype=jnp.int32)
            visited_d, frontier_d, hist, depth = run(
                visited_d, frontier_d, hist)
            d = int(depth)
            total_levels += d
            # while_loop exits with active=False either done or at the cap;
            # continue only if the cap was hit with a live frontier
            if not hists and (d < max_levels
                              or not bool(jnp.any(frontier_d != 0))):
                # common case: one chunk — keep hist whole (no 2-4 GB slice
                # copy); trailing all-zero rows contribute nothing
                return PackedBfsResult(visited_d, hist, d, sources)
            hists.append(hist[:d])
            if d < max_levels or not bool(jnp.any(frontier_d != 0)):
                break
    else:
        step = _make_packed_level_fn(ell, W)
        hist_rows = []
        while True:
            visited_d, frontier_d, any_fresh = step(visited_d, frontier_d)
            hist_rows.append(frontier_d[:n][None])
            total_levels += 1
            if not bool(any_fresh):
                break
        hists = hist_rows
    hist_full = jnp.concatenate(hists, axis=0) if len(hists) > 1 else \
        hists[0]
    return PackedBfsResult(visited_d, hist_full, total_levels, sources)


def bfs_levels(at_csr: CSR, src: int, max_depth=None):
    """BFS levels from src.  `at_csr` must be the TRANSPOSE adjacency
    (rows = dst) so the per-level reduce is sorted."""
    if src < 0:
        return np.full(at_csr.n_rows, 2**30, dtype=np.int32)
    return _bfs_jit(at_csr.indptr, at_csr.rows, at_csr.cols, at_csr.nnz,
                    at_csr.n_rows, src, max_depth)


def bfs_levels_parents(a_csr_or_comp, src: int, max_depth=None):
    """Levels + parents.  Accepts the forward CSR (builds transpose) for
    procedure use."""
    at = a_csr_or_comp.transpose_host() if isinstance(a_csr_or_comp, CSR) \
        else a_csr_or_comp
    if src < 0:
        n = at.n_rows
        return (np.full(n, 2**30, np.int32), np.full(n, -1, np.int32))
    levels, parents = _bfs_parents_jit(at.indptr, at.rows, at.cols, at.nnz,
                                       at.n_rows, src)
    if max_depth is not None:
        levels = jnp.where(levels > max_depth, 2**30, levels)
    return levels, parents
