"""Host-side simulation: per-level chunk saturation for gated multi-lane BFS.

Question for the bench kernel design: if the degree-DESC-sorted transpose
ELL is split into row chunks and a chunk is skipped once ALL its rows are
visited in ALL k lanes, how many padded-edge gathers does a full batched
BFS actually need (vs levels * all-edges)?

Pure numpy (CPU), scale <= 20.  Prints per-level active-edge fractions and
the effective number of full passes.
"""

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    scale = int(os.environ.get("SCALE", "18"))
    k = int(os.environ.get("K", "512"))
    chunk_edges = int(os.environ.get("CHUNK", str(1 << 20)))
    from bench import load_rmat, sorted_transpose

    cache_dir = os.path.join(ROOT, ".bench_cache")
    src, dst, n = load_rmat(scale, cache_dir)
    indptr, cols, perm = sorted_transpose(src, dst, n, scale, cache_dir)
    deg = (indptr[1:] - indptr[:-1]).astype(np.int64)

    outdeg = np.bincount(src, minlength=n)
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    rng = np.random.default_rng(7)
    roots = inv[rng.choice(np.nonzero(outdeg > 0)[0], size=k, replace=False)]

    # chunk boundaries over rows (degree-sorted): ~chunk_edges padded each.
    # emulate ELL padding by bucket widths power-of-2-ish
    width = np.maximum(deg, 1)
    width = 2 ** np.ceil(np.log2(np.maximum(deg, 1))).astype(np.int64)
    width[deg == 0] = 0
    csum = np.cumsum(width)
    bounds = [0]
    target = chunk_edges
    for i in range(n):
        if csum[i] >= target:
            bounds.append(i + 1)
            target = csum[i] + chunk_edges
    if bounds[-1] != n:
        bounds.append(n)
    bounds = np.asarray(bounds)
    nchunks = len(bounds) - 1
    chunk_pad = np.diff(csum[np.maximum(bounds - 1, 0)])
    chunk_pad = np.array([
        csum[bounds[i + 1] - 1] - (csum[bounds[i] - 1] if bounds[i] else 0)
        for i in range(nchunks)])
    total_pad = int(csum[-1])
    print(f"# n={n} m={len(src)} padded={total_pad} chunks={nchunks}")

    # batched BFS: visited (n, k) bool — memory: scale 18 * 512 = 134M bool
    visited = np.zeros((n, k), dtype=bool)
    visited[roots, np.arange(k)] = True
    frontier = visited.copy()
    # per-level: fresh[dst] = any in-neighbor in frontier
    t0 = time.time()
    level = 0
    touched = 0.0
    full = float(total_pad)
    while True:
        # chunk active unless fully saturated
        sat = visited.all(axis=1)
        active_pad = 0
        for c in range(nchunks):
            lo, hi = bounds[c], bounds[c + 1]
            if not sat[lo:hi].all():
                active_pad += chunk_pad[c]
        # propagate (exact, row-block-wise to bound memory)
        fresh_any = False
        newv = visited.copy()
        B = 1 << 16
        for lo in range(0, n, B):
            hi = min(lo + B, n)
            s, e = indptr[lo], indptr[hi]
            if e == s:
                continue
            cs = cols[s:e]
            f = frontier[cs]  # (edges, k)
            seg = np.repeat(np.arange(hi - lo), deg[lo:hi])
            reach = np.zeros((hi - lo, k), dtype=bool)
            np.logical_or.at(reach, seg, f)
            newv[lo:hi] |= reach
        fresh = newv & ~visited
        fresh_any = fresh.any()
        if not fresh_any:
            break
        touched += active_pad
        level += 1
        frontier = fresh
        visited = newv
        print(f"# level {level}: active_pad={active_pad/full:.3f} "
              f"fresh={fresh.sum()} sat_rows={sat.sum()}/{n}", flush=True)
        if level > 30:
            break
    print(f"RESULT levels={level} effective_full_passes={touched/full:.2f} "
          f"({time.time()-t0:.0f}s sim)")


if __name__ == "__main__":
    main()
