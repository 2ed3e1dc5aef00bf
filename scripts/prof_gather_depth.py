"""Probe: XLA row-gather throughput vs OR-chain depth (form B).

r3 measured 12.6 ns/row with 16 concurrent gathers in flight (VW=16).
This asks whether 32/64-deep chains pipeline further — if yes, raising
bfs_packed.VW is a direct GTEPS lever; if no, 16 stays and the narrative
records the plateau.  Rows are (n+1, 128) int16 (the 2048-lane layout).

    python scripts/prof_gather_depth.py        # on the TPU
"""

import os
import sys
import time
from functools import partial

import numpy as np
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import jax.numpy as jnp


def main():
    n = 1 << 22  # 4M rows x 256 B = 1.1 GB table (fits easily)
    rows = 1 << 22  # gathered rows per call per chain
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.integers(0, 1 << 15, (n + 1, 128)).astype(np.int16))
    print(f"device: {jax.devices()[0]} table {(n+1)*256/1e9:.2f} GB",
          flush=True)

    for depth in (8, 16, 32, 64):
        idx = jnp.asarray(
            rng.integers(0, n, (depth, rows), dtype=np.int32))

        @jax.jit
        def f(tab, idx, depth=depth):
            acc = jnp.take(tab, idx[0], axis=0, mode="clip")
            for j in range(1, depth):
                acc = jnp.bitwise_or(
                    acc, jnp.take(tab, idx[j], axis=0, mode="clip"))
            return acc

        y = f(tab, idx)
        float(jnp.sum(y.astype(jnp.float32)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            y = f(tab, idx)
            float(jnp.sum(y.astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        tot = depth * rows
        print(f"depth {depth:3d}: {best*1e3:8.1f} ms "
              f"{best/tot*1e9:6.2f} ns/row "
              f"{tot*256/best/1e9:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    sys.exit(main())
