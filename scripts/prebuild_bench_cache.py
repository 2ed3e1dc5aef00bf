"""Rebuild .bench_cache host artifacts (RMAT, sorted CSR, packed ELL,
aux) for the bench scales without touching the TPU relay.

Round caches are wiped between driver rounds; a cold bench run burns
~10 min of numpy before the first device op (VERDICT r2 #1).  Run this
early in the round so the end-of-round bench goes straight to upload:

    python scripts/prebuild_bench_cache.py           # scale 24
    BENCH_SCALES=20,22,24 python scripts/prebuild_bench_cache.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # env alone loses to sitecustomize

import bench  # noqa: E402


def main():
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(bench.__file__)),
                             ".bench_cache")
    scales = [int(s) for s in
              os.environ.get("BENCH_SCALES", "24").split(",")]
    chunk_edges = int(os.environ.get("BENCH_CHUNK_EDGES", str(32 << 20)))
    for scale in scales:
        t0 = time.time()
        bench.load_rmat(scale, cache_dir)
        print(f"scale {scale}: rmat {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        bench.prepare_packed(scale, chunk_edges, cache_dir)
        print(f"scale {scale}: packed {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        bench.prepare_aux(scale, cache_dir)
        print(f"scale {scale}: aux {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
