"""Isolate the per-level costs of the sorted-ELL BFS step on TPU:
gather formulations, OR-reduce, packed-level unpack.  One config/process.

  SCALE=20 K=512 timeout 560 python scripts/prof_bfs_parts.py
"""

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def timed(fn, *args, reps=3, label=""):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    # force real completion through the relay with a tiny host fetch
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(leaf.reshape(-1)[0])
        best = min(best, time.time() - t0)
    print(f"# {label}: {best*1000:.1f} ms", flush=True)
    return best


def main():
    scale = int(os.environ.get("SCALE", "20"))
    k = int(os.environ.get("K", "512"))
    widths = tuple(int(w) for w in os.environ.get(
        "WIDTHS", "2,4,8,16,32,64,128,256,512,1024,2048,4096,8192,16384,"
        "32768,65536").split(","))
    cache_dir = os.path.join(ROOT, ".bench_cache")

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from falkordb_tpu.sparse.ell import build_blocked_ell_sorted

    d = np.load(os.path.join(cache_dir, f"rmat{scale}_at_sorted.npz"))
    indptr, cols, perm = d["indptr"], d["cols"], d["perm"]
    n = len(indptr) - 1
    ell = build_blocked_ell_sorted(indptr, cols, n, widths=widths)
    W = (k + 31) // 32
    print(f"# n={n} m={len(cols)} pad={ell.padded_edges/ell.true_edges:.2f} "
          f"W={W}", flush=True)

    rng = np.random.default_rng(0)
    frontier = jnp.asarray(
        rng.integers(0, 2**31, size=(n + 1, W)).astype(np.int32))
    visited = jnp.asarray(
        rng.integers(0, 2**31, size=(n + 1, W)).astype(np.int32))
    levels = jnp.asarray(np.full((n, k), 127, dtype=np.int8))

    bucket_args = [(b.row_offset, b.cols) for b in ell.buckets]

    @jax.jit
    def gather_2d(frontier):
        parts = []
        for off, c in bucket_args:
            gat = jnp.take(frontier, c, axis=0, mode="clip")
            parts.append(jax.lax.reduce(gat, jnp.int32(0),
                                        jax.lax.bitwise_or, (1,)))
        return jnp.concatenate(parts, axis=0)

    @jax.jit
    def gather_flat(frontier):
        parts = []
        for off, c in bucket_args:
            r, w = c.shape
            gat = jnp.take(frontier, c.reshape(-1), axis=0,
                           mode="clip").reshape(r, w, W)
            parts.append(jax.lax.reduce(gat, jnp.int32(0),
                                        jax.lax.bitwise_or, (1,)))
        return jnp.concatenate(parts, axis=0)

    @jax.jit
    def gather_only_no_reduce(frontier):
        # raw gather traffic: sum instead of reduce-or, single big bucket
        tot = jnp.zeros((), jnp.int32)
        for off, c in bucket_args:
            gat = jnp.take(frontier, c.reshape(-1), axis=0, mode="clip")
            tot = tot + jnp.sum(gat[::1024, :1])
        return tot

    @jax.jit
    def unpack_update(levels, fresh):
        shifts = jnp.arange(32, dtype=jnp.int32)
        bits = jnp.bitwise_and(
            jnp.right_shift(fresh[:n, :, None], shifts[None, None, :]),
            1).astype(jnp.int8)
        bits = bits.reshape(n, W * 32)[:, :k]
        return jnp.where((bits > 0) & (levels == 127), jnp.int8(3), levels)

    @jax.jit
    def visited_update(visited, reach):
        fresh = jnp.bitwise_and(reach[:n], jnp.bitwise_not(visited[:n]))
        v2 = visited.at[:n].set(jnp.bitwise_or(visited[:n], fresh))
        return v2, fresh

    reach = gather_2d(frontier)
    timed(gather_2d, frontier, label="gather_2d + or-reduce")
    timed(gather_flat, frontier, label="gather_flat + or-reduce")
    timed(gather_only_no_reduce, frontier, label="gather_flat no-reduce")
    timed(unpack_update, levels, visited, label="unpack+levels update")
    timed(visited_update, visited, reach, label="visited update")


if __name__ == "__main__":
    main()
