"""Synthetic single-bucket gather-formulation microbenchmark (real TPU).

Isolates the per-edge cost of the BFS level step's core op:
  reach[r] = OR_j frontier[cols[r, j]]     (r rows, width w, W words)

  A: 3D gather (r, w, W) + lax.reduce over axis 1   (round-1 kernel form)
  B: static loop over j: acc |= frontier[colsT[j]]  (2D row gathers)

Tiny programs — one pallas-free jit per (form, w); compile via relay is
fast.  SCALE sets n (frontier rows); R total gathered rows per config.
"""

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    n = 1 << int(os.environ.get("SCALE", "20"))
    W = int(os.environ.get("W", "16"))
    total = int(os.environ.get("R", str(16 * 1024 * 1024)))
    widths = [int(x) for x in os.environ.get("WS", "4,16,64").split(",")]
    forms = os.environ.get("FORMS", "A,B").split(",")
    dtype = os.environ.get("DTYPE", "int32")

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    t0 = time.time()
    dt = np.dtype(dtype)
    frontier = jnp.asarray(
        rng.integers(0, 127, size=(n + 1, W), dtype=np.int64).astype(dt))
    frontier.block_until_ready()
    print(f"# frontier upload {(n+1)*W*dt.itemsize/1e6:.0f} MB "
          f"({dtype}) in {time.time()-t0:.1f}s", flush=True)

    for w in widths:
        r = total // w
        idx = rng.integers(0, n, size=(r, w)).astype(np.int32)
        t0 = time.time()
        cols = jnp.asarray(idx)
        colsT = jnp.asarray(np.ascontiguousarray(idx.T))
        colsT.block_until_ready()
        print(f"# cols upload w={w} {time.time()-t0:.1f}s", flush=True)

        def form_A(cols, f):
            gat = jnp.take(f, cols, axis=0, mode="clip")  # (r, w, W)
            return jax.lax.reduce(gat, jnp.zeros((), f.dtype)[()],
                                  jax.lax.bitwise_or, (1,))

        def form_B(colsT, f):
            acc = jnp.take(f, colsT[0], axis=0, mode="clip")
            for j in range(1, w):
                acc = jnp.bitwise_or(
                    acc, jnp.take(f, colsT[j], axis=0, mode="clip"))
            return acc

        for name in forms:
            fn = jax.jit(form_A if name == "A" else form_B)
            arg = cols if name == "A" else colsT
            t0 = time.time()
            out = fn(arg, frontier)
            _ = float(jnp.sum(out[:2]))
            compile_s = time.time() - t0
            best = float("inf")
            for _i in range(3):
                t0 = time.time()
                out = fn(arg, frontier)
                _ = float(jnp.sum(out[:2]))
                best = min(best, time.time() - t0)
            print(f"PROF form={name} w={w} r={r} W={W} {dtype}: "
                  f"{best*1000:.1f} ms = {best*1e9/(r*w):.2f} ns/edge-row "
                  f"(compile {compile_s:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
