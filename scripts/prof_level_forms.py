"""Profile per-level BFS reach formulations on the real TPU.

The round-1 kernel computes reach via a 3D gather (r, w, W) + lax.reduce
over the width axis — measured ~45 ns/padded-edge at W=64, far above the
~2-3 ns/row v5e row-gather floor.  This script times alternatives:

  A: gather (r, w, W) + lax.reduce axis=1            (round-1 kernel)
  B: static loop over width columns, acc |= frontier[colsT[j]]
     (each step = contiguous row gather of W words + elementwise OR;
     width chunked so the 3D intermediate is (r, w/CW, W))

Run ONE process at a time (single TPU holder):
  SCALE=20 K=512 timeout 560 python scripts/prof_level_forms.py
"""

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    scale = int(os.environ.get("SCALE", "20"))
    k = int(os.environ.get("K", "512"))
    reps = int(os.environ.get("REPS", "3"))
    cw = int(os.environ.get("CW", "32"))
    forms = os.environ.get("FORMS", "A,B").split(",")

    cache_dir = os.path.join(ROOT, ".bench_cache")
    os.makedirs(cache_dir, exist_ok=True)
    from bench import load_rmat, sorted_transpose

    t0 = time.time()
    src, dst, n = load_rmat(scale, cache_dir)
    indptr, cols, perm = sorted_transpose(src, dst, n, scale, cache_dir)
    print(f"# graph ready {time.time()-t0:.1f}s n={n} m={len(src)}",
          flush=True)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from falkordb_tpu.sparse.ell import build_blocked_ell_sorted

    t0 = time.time()
    ell = build_blocked_ell_sorted(indptr, cols, n)
    print(f"# ell {time.time()-t0:.1f}s pad={ell.padded_edges/ell.true_edges:.2f} "
          f"buckets={[(b.width, b.cols.shape[0]) for b in ell.buckets]}",
          flush=True)
    W = (k + 31) // 32

    # representative mid-BFS state: ~35% frontier bits, 50% visited bits
    rng = np.random.default_rng(3)
    frontier = (rng.random((n + 1, W, 32)) < 0.35)
    frontier[n] = False
    packf = np.zeros((n + 1, W), np.uint32)
    for b in range(32):
        packf |= frontier[:, :, b].astype(np.uint32) << np.uint32(b)
    visited = packf | (rng.random((n + 1, W)) < 0.3).astype(np.uint32)
    f_d = jnp.asarray(packf.view(np.int32))
    v_d = jnp.asarray(visited.view(np.int32))

    offsets = tuple(int(b.row_offset) for b in ell.buckets)
    cols_t = tuple(b.cols for b in ell.buckets)
    # transposed cols for form B: contiguous column slices
    colsT_t = tuple(jnp.asarray(np.ascontiguousarray(
        np.asarray(b.cols).T)) for b in ell.buckets)

    def reach_A(cols_t, frontier):
        parts = []
        covered = 0
        for off, c in zip(offsets, cols_t):
            gat = jnp.take(frontier, c, axis=0, mode="clip")
            parts.append(jax.lax.reduce(
                gat, jnp.int32(0), jax.lax.bitwise_or, (1,)))
            covered = off + c.shape[0]
        if covered < n:
            parts.append(jnp.zeros((n - covered, W), jnp.int32))
        return jnp.concatenate(parts, axis=0)

    def reach_B(colsT_t, frontier):
        parts = []
        covered = 0
        for off, cT in zip(offsets, colsT_t):
            w, r = cT.shape
            step = min(cw, w)
            nchunk = w // step if w % step == 0 else None
            if nchunk:
                acc = jnp.zeros((nchunk, r, W), jnp.int32)
                for j in range(step):
                    # (nchunk, r) indices -> (nchunk, r, W) gather
                    idx = cT.reshape(nchunk, step, r)[:, j]
                    acc = jnp.bitwise_or(
                        acc, jnp.take(frontier, idx, axis=0, mode="clip"))
                red = jax.lax.reduce(acc, jnp.int32(0),
                                     jax.lax.bitwise_or, (0,))
            else:
                acc = jnp.zeros((r, W), jnp.int32)
                for j in range(w):
                    acc = jnp.bitwise_or(
                        acc, jnp.take(frontier, cT[j], axis=0, mode="clip"))
                red = acc
            parts.append(red)
            covered = off + r
        if covered < n:
            parts.append(jnp.zeros((n - covered, W), jnp.int32))
        return jnp.concatenate(parts, axis=0)

    def make_step(reach_fn, carg):
        @jax.jit
        def step(carg, visited, frontier):
            reach = reach_fn(carg, frontier)
            fresh = jnp.bitwise_and(reach, jnp.bitwise_not(visited[:n]))
            visited = visited.at[:n].set(jnp.bitwise_or(visited[:n], fresh))
            frontier = jnp.concatenate(
                [fresh, jnp.zeros((1, W), jnp.int32)], axis=0)
            return visited, frontier, jnp.any(fresh != 0)
        return lambda v, f: step(carg, v, f)

    variants = {}
    if "A" in forms:
        variants["A"] = make_step(reach_A, cols_t)
    if "B" in forms:
        variants["B"] = make_step(reach_B, colsT_t)

    for name, step in variants.items():
        t0 = time.time()
        v2, f2, anyf = step(v_d, f_d)
        _ = float(jnp.sum(v2[:4]))  # force
        print(f"# {name} compile+run {time.time()-t0:.1f}s", flush=True)
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            v2, f2, anyf = step(v_d, f_d)
            _ = float(jnp.sum(v2[:4]))
            best = min(best, time.time() - t0)
        ns_row = best * 1e9 / ell.padded_edges
        print(f"PROF {name} W={W} scale={scale}: {best*1000:.1f} ms/level "
              f"= {ns_row:.2f} ns/padded-edge", flush=True)


if __name__ == "__main__":
    main()
