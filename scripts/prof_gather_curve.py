"""Map the ELL frontier-gather cost vs packed row width (lanes/32) on TPU.

One process measures gather+OR-reduce for W in WS over the same sorted ELL.
  SCALE=20 WS=2,4,16,32,64 timeout 560 python scripts/prof_gather_curve.py
"""

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    scale = int(os.environ.get("SCALE", "20"))
    ws_list = [int(w) for w in os.environ.get("WS", "2,4,16,32").split(",")]
    widths = tuple(int(w) for w in os.environ.get(
        "WIDTHS", "2,4,8,16,32,64,128,256,512,1024,2048,4096,8192,16384,"
        "32768,65536").split(","))

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from falkordb_tpu.sparse.ell import build_blocked_ell_sorted

    d = np.load(os.path.join(ROOT, ".bench_cache",
                             f"rmat{scale}_at_sorted.npz"))
    indptr, cols = d["indptr"], d["cols"]
    n = len(indptr) - 1
    ell = build_blocked_ell_sorted(indptr, cols, n, widths=widths)
    rows_pad = ell.padded_edges
    print(f"# n={n} padded_rows={rows_pad}", flush=True)
    bucket_args = [(b.row_offset, b.cols) for b in ell.buckets]
    rng = np.random.default_rng(0)

    for W in ws_list:
        frontier = jnp.asarray(
            rng.integers(0, 2**31, size=(n + 1, W)).astype(np.int32))

        @jax.jit
        def gather(frontier):
            parts = []
            for off, c in bucket_args:
                gat = jnp.take(frontier, c, axis=0, mode="clip")
                parts.append(jax.lax.reduce(gat, jnp.int32(0),
                                            jax.lax.bitwise_or, (1,)))
            return jnp.concatenate(parts, axis=0)

        out = gather(frontier)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out = gather(frontier)
            _ = float(out[0, 0])
            best = min(best, time.time() - t0)
        print(f"# W={W} ({W*32} lanes, {W*4}B rows): {best*1000:.1f} ms "
              f"= {best*1e9/rows_pad:.2f} ns/row, "
              f"{rows_pad*W*4/best/1e9:.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
