"""Gated packed BFS (algos/bfs_packed.py) vs the round-1 packed kernel and
a numpy oracle — including disconnected fringes (gating must stay exact)
and host-seeded level 1."""

import numpy as np
import pytest

from falkordb_tpu.sparse.ell import build_blocked_ell_sorted
from falkordb_tpu.algos.bfs_packed import bfs_multi_gated


def _graph(n, m, seed, with_fringe=True):
    rng = np.random.default_rng(seed)
    core = int(n * 0.7)
    src = rng.integers(0, core, m)
    dst = rng.integers(0, core, m)
    if with_fringe:
        # fringe nodes with in-edges only (never reachable backward paths
        # differ) and some isolated chains
        fs = rng.integers(core, n, m // 10)
        fd = rng.integers(core, n, m // 10)
        src = np.concatenate([src, fs])
        dst = np.concatenate([dst, fd])
    return src.astype(np.int64), dst.astype(np.int64)


def _prep(src, dst, n):
    indeg = np.bincount(dst, minlength=n)
    perm = np.argsort(-indeg, kind="stable")
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    ndst, nsrc = inv[dst], inv[src]
    order = np.argsort(ndst, kind="stable")
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(ndst, minlength=n), out=indptr[1:])
    cols = nsrc[order].astype(np.int32)
    orderf = np.argsort(nsrc, kind="stable")
    fip = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(nsrc, minlength=n), out=fip[1:])
    fcols = ndst[orderf].astype(np.int32)
    return indptr, cols, fip, fcols, inv, nsrc, ndst


def _oracle_reached(fip, fcols, root, n):
    seen = np.zeros(n, bool)
    seen[root] = True
    frontier = [root]
    while frontier:
        nxt = []
        for u in frontier:
            for v in fcols[fip[u]: fip[u + 1]]:
                if not seen[v]:
                    seen[v] = True
                    nxt.append(int(v))
        frontier = nxt
    return seen


@pytest.mark.parametrize("dtype,k", [(np.int16, 37), (np.int8, 17),
                                     (np.int32, 40)])
def test_gated_bfs_matches_oracle(dtype, k):
    n, m = 1500, 6000
    src, dst = _graph(n, m, seed=5)
    indptr, cols, fip, fcols, inv, nsrc, ndst = _prep(src, dst, n)
    ell = build_blocked_ell_sorted(indptr, cols, n)
    rng = np.random.default_rng(9)
    outdeg = np.bincount(src, minlength=n)
    roots = inv[rng.choice(np.nonzero(outdeg > 0)[0], size=k, replace=False)]
    res = bfs_multi_gated(ell, roots, fip, fcols, word_dtype=dtype,
                          chunk_edges=2048)
    counts = np.asarray(res.weighted_counts(None))
    wdeg = np.bincount(nsrc, minlength=n).astype(np.float64)
    wcounts = np.asarray(res.weighted_counts(wdeg))
    for lane, r in enumerate(roots):
        seen = _oracle_reached(fip, fcols, int(r), n)
        assert counts[lane] == seen.sum(), f"lane {lane}"
        assert wcounts[lane] == wdeg[seen].sum()


def test_gated_bfs_no_seed_matches_seeded():
    n, m = 1200, 5000
    src, dst = _graph(n, m, seed=2)
    indptr, cols, fip, fcols, inv, _, _ = _prep(src, dst, n)
    ell = build_blocked_ell_sorted(indptr, cols, n)
    rng = np.random.default_rng(1)
    outdeg = np.bincount(src, minlength=n)
    roots = inv[rng.choice(np.nonzero(outdeg > 0)[0], size=16, replace=False)]
    seeded = bfs_multi_gated(ell, roots, fip, fcols, word_dtype=np.int16)
    plain = bfs_multi_gated(ell, roots, None, None, word_dtype=np.int16)
    a = np.asarray(seeded.weighted_counts(None))
    b = np.asarray(plain.weighted_counts(None))
    assert np.array_equal(a, b)
    assert seeded.nlevels <= plain.nlevels + 1


@pytest.mark.parametrize("temp_bytes", [1 << 30, 4096])
def test_hostdriven_matches_oracle(temp_bytes, monkeypatch):
    """Host-driven per-chunk dispatch path, both unblocked (one fori
    iteration) and with a tiny temp budget forcing many gather blocks
    per chunk (the scale-24 HBM-headroom configuration)."""
    import falkordb_tpu.algos.bfs_packed as bp
    from falkordb_tpu.algos.bfs_packed import (bfs_multi_gated_hostdriven,
                                               build_packed_ell)

    monkeypatch.setattr(bp, "_CHUNK_TEMP_BYTES", temp_bytes)
    monkeypatch.setattr(bp, "_JIT_CACHE", {})
    n, m = 1500, 6000
    src, dst = _graph(n, m, seed=11)
    indptr, cols, fip, fcols, inv, nsrc, _ = _prep(src, dst, n)
    ell = build_blocked_ell_sorted(indptr, cols, n)
    packed = build_packed_ell(ell, chunk_edges=2048)
    rng = np.random.default_rng(3)
    outdeg = np.bincount(src, minlength=n)
    roots = inv[rng.choice(np.nonzero(outdeg > 0)[0], size=37,
                           replace=False)]
    res = bfs_multi_gated_hostdriven(roots, packed, fwd_indptr=fip,
                                     fwd_cols=fcols, word_dtype=np.int16)
    counts = np.asarray(res.weighted_counts(None))
    for lane, r in enumerate(roots):
        seen = _oracle_reached(fip, fcols, int(r), n)
        assert counts[lane] == seen.sum(), f"lane {lane}"


@pytest.mark.parametrize("temp_bytes", [1 << 30, 4096])
def test_hostdriven_sparse_level_matches(temp_bytes, monkeypatch):
    """The level-2 sparse shortcut (mini-ELL over the level-1 union's
    out-edges) must be bit-exact with the full-chunk path, at both a
    roomy and a tiny gather-temp budget (blocked scatter path)."""
    import falkordb_tpu.algos.bfs_packed as bp
    from falkordb_tpu.algos.bfs_packed import (bfs_multi_gated_hostdriven,
                                               build_packed_ell,
                                               build_sparse_level)

    monkeypatch.setattr(bp, "_CHUNK_TEMP_BYTES", temp_bytes)
    monkeypatch.setattr(bp, "_JIT_CACHE", {})
    n, m = 1500, 6000
    src, dst = _graph(n, m, seed=23)
    indptr, cols, fip, fcols, inv, nsrc, _ = _prep(src, dst, n)
    ell = build_blocked_ell_sorted(indptr, cols, n)
    packed = build_packed_ell(ell, chunk_edges=2048)
    rng = np.random.default_rng(8)
    outdeg = np.bincount(src, minlength=n)
    roots = inv[rng.choice(np.nonzero(outdeg > 0)[0], size=37,
                           replace=False)]
    union = np.unique(np.concatenate(
        [fcols[fip[r]: fip[r + 1]] for r in roots]))
    sparse = build_sparse_level(fip, fcols, union, n,
                                widths=(2, 8, 32, 128))
    full = bfs_multi_gated_hostdriven(roots, packed, fwd_indptr=fip,
                                      fwd_cols=fcols, word_dtype=np.int16)
    fast = bfs_multi_gated_hostdriven(roots, packed, fwd_indptr=fip,
                                      fwd_cols=fcols, word_dtype=np.int16,
                                      sparse_first=sparse)
    assert np.array_equal(np.asarray(full.visited), np.asarray(fast.visited))
    assert full.nlevels == fast.nlevels
    counts = np.asarray(fast.weighted_counts(None))
    for lane, r in enumerate(roots):
        seen = _oracle_reached(fip, fcols, int(r), n)
        assert counts[lane] == seen.sum(), f"lane {lane}"
