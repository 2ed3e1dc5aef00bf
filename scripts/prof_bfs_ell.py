"""Profile the sorted blocked-ELL bit-packed batched BFS on the real TPU.

Env knobs: SCALE (20), K (256 lanes), FUSED (1), WIDTHS, REPS (3).
Reuses bench.py's RMAT cache; caches the degree-sorted transpose CSR.

Run ONE config per process (the axon relay allows a single TPU holder):
  SCALE=20 K=256 FUSED=0 timeout 560 python scripts/prof_bfs_ell.py
"""

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    scale = int(os.environ.get("SCALE", "20"))
    k = int(os.environ.get("K", "256"))
    fused = os.environ.get("FUSED", "1") == "1"
    reps = int(os.environ.get("REPS", "3"))
    widths = tuple(int(w) for w in os.environ.get(
        "WIDTHS", "4,16,64,256,1024,8192,65536").split(","))

    cache_dir = os.path.join(ROOT, ".bench_cache")
    os.makedirs(cache_dir, exist_ok=True)
    sys.path.insert(0, ROOT)
    from bench import rmat_edges

    t0 = time.time()
    cache = os.path.join(cache_dir, f"rmat{scale}.npz")
    if os.path.exists(cache):
        d = np.load(cache)
        src, dst, n = d["src"].astype(np.int64), d["dst"].astype(np.int64), \
            int(d["n"])
    else:
        src, dst, n = rmat_edges(scale)
        np.savez(cache, src=src.astype(np.int32), dst=dst.astype(np.int32),
                 n=n)
    m = len(src)
    print(f"# rmat s={scale} n={n} m={m} load {time.time()-t0:.1f}s",
          flush=True)

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from falkordb_tpu.sparse.ell import (build_blocked_ell_sorted,
                                         degree_sort_permutation)
    from falkordb_tpu.algos.bfs import (_packed_init, _make_sorted_level_fn,
                                        _make_sorted_fused_fn)

    # degree-sorted transpose CSR (cache)
    t0 = time.time()
    sorted_cache = os.path.join(cache_dir, f"rmat{scale}_at_sorted.npz")
    if os.path.exists(sorted_cache):
        d = np.load(sorted_cache)
        indptr, cols, perm = d["indptr"], d["cols"], d["perm"]
    else:
        indeg = np.bincount(dst, minlength=n)
        perm = np.argsort(-indeg, kind="stable")  # perm[new]=old
        inv = np.empty(n, np.int64)
        inv[perm] = np.arange(n)
        ndst, nsrc = inv[dst], inv[src]
        order = np.argsort(ndst, kind="stable")
        rows_s, cols_np = ndst[order], nsrc[order]
        indptr = np.zeros(n + 1, np.int64)
        np.cumsum(np.bincount(rows_s, minlength=n), out=indptr[1:])
        cols = cols_np.astype(np.int32)
        np.savez(sorted_cache, indptr=indptr, cols=cols, perm=perm)
    print(f"# sorted AT {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    ell = build_blocked_ell_sorted(indptr, cols, n, widths=widths)
    print(f"# ell build {time.time()-t0:.1f}s pad_ratio="
          f"{ell.padded_edges/ell.true_edges:.2f} buckets="
          f"{[(b.width, b.cols.shape[0]) for b in ell.buckets]}", flush=True)

    outdeg = np.bincount(src, minlength=n)
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    rng = np.random.default_rng(7)
    roots_orig = rng.choice(np.nonzero(outdeg > 0)[0], size=k, replace=False)
    roots = inv[roots_orig]
    outdeg_new = jnp.asarray(outdeg[perm].astype(np.int32))

    W, visited, frontier, levels = _packed_init(n, roots)
    v0, f0, l0 = jnp.asarray(visited), jnp.asarray(frontier), \
        jnp.asarray(levels)

    @jax.jit
    def traversed(vis):
        shifts = jnp.arange(32, dtype=jnp.int32)
        bits = jnp.bitwise_and(
            jnp.right_shift(vis[:n, :, None], shifts[None, None, :]), 1)
        bits = bits.reshape(n, W * 32)[:, :k]
        return jnp.einsum("nk,n->k", bits.astype(jnp.float32),
                          outdeg_new.astype(jnp.float32))

    if fused:
        run = _make_sorted_fused_fn(ell, W, k)
        t0 = time.time()
        vis, lv = run(v0, f0, l0)
        edges = np.asarray(traversed(vis))
        print(f"# fused compile+run {time.time()-t0:.1f}s", flush=True)
        best = float("inf")
        for _ in range(reps):
            W2, visited, frontier, levels = _packed_init(n, roots)
            args = (jnp.asarray(visited), jnp.asarray(frontier),
                    jnp.asarray(levels))
            jax.block_until_ready(args)
            t0 = time.time()
            vis, lv = run(*args)
            tot = float(jnp.sum(vis[:8]).block_until_ready())  # force fetch
            dt = time.time() - t0
            best = min(best, dt)
            print(f"# fused run {dt*1000:.1f} ms", flush=True)
    else:
        step = _make_sorted_level_fn(ell, W, k)
        t0 = time.time()
        vis, fr, lv = v0, f0, l0
        depth = 0
        while True:
            vis, fr, lv, any_fresh = step(vis, fr, lv, jnp.int32(depth))
            depth += 1
            if not bool(any_fresh):
                break
        edges = np.asarray(traversed(vis))
        print(f"# stepped compile+run {time.time()-t0:.1f}s "
              f"({depth} levels)", flush=True)
        best = float("inf")
        for _ in range(reps):
            W2, visited, frontier, levels = _packed_init(n, roots)
            vis, fr, lv = (jnp.asarray(visited), jnp.asarray(frontier),
                           jnp.asarray(levels))
            jax.block_until_ready((vis, fr, lv))
            t0 = time.time()
            depth = 0
            lvl_t = []
            while True:
                tl = time.time()
                vis, fr, lv, any_fresh = step(vis, fr, lv, jnp.int32(depth))
                go = bool(any_fresh)
                lvl_t.append(time.time() - tl)
                depth += 1
                if not go:
                    break
            dt = time.time() - t0
            best = min(best, dt)
            print(f"# stepped run {dt*1000:.1f} ms levels="
                  f"{[f'{t*1000:.0f}' for t in lvl_t]}", flush=True)

    total_edges = float(edges.sum())
    gteps = total_edges / best / 1e9
    print(f"RESULT scale={scale} k={k} fused={fused} "
          f"best={best*1000:.1f}ms edges={total_edges:.3g} "
          f"GTEPS={gteps:.3f}", flush=True)


if __name__ == "__main__":
    main()
