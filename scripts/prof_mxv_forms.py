"""Probe: which mxv/spmm formulation escapes the r4 0.2%-of-roof wall.

Forms measured at scale 20/22 (RMAT, power-of-2 cap):
  a) current sparse/ops.py mxv (any_pair + plus_times)
  b) bare x-gather (take by cols) — the irreducible cost
  c) 8-way chained x-gather (independent takes, concat)
  d) gather + sorted segment_sum, no masks
  e) spmm k8 current vs chunked fori_loop (no (cap,k) materialization)

Run: timeout 560 python scripts/prof_mxv_forms.py 2>&1 | tail -30
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import load_rmat


def timeit(fn, *args, reps=3):
    out = fn(*args)
    float(jnp.sum(out))  # force through relay optimism with a host fetch
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    cache = "/root/repo/.bench_cache"
    from falkordb_tpu.sparse import ops as sops
    from falkordb_tpu.sparse import semiring as sr
    from falkordb_tpu.sparse.csr import CSR

    for scale in (20, 22):
        src, dst, n = load_rmat(scale, cache)
        A = CSR.from_coo_numpy(src, dst, None, shape=(n, n), dedup=False)
        m = A.cap
        print(f"== scale {scale}: n={n} cap={m}", flush=True)
        x = jnp.ones(n, jnp.float32)
        xi = jnp.ones(n, jnp.int32)
        cols = A.cols
        rows = A.rows

        f_cur = jax.jit(lambda A_, v: sops.mxv(sr.PLUS_TIMES_F32, A_, v))
        t = timeit(f_cur, A, x)
        print(f"mxv_plus_times current: {t*1e3:.1f} ms "
              f"({t/m*1e9:.2f} ns/edge)", flush=True)

        f_take = jax.jit(lambda c, v: jnp.take(v, c, mode="clip").sum())
        t = timeit(f_take, cols, x)
        print(f"bare take+sum: {t*1e3:.1f} ms ({t/m*1e9:.2f} ns/edge)",
              flush=True)

        D = 8
        L = m // D

        @jax.jit
        def f_chain(c, v):
            parts = [jnp.take(v, jax.lax.dynamic_slice(c, (d * L,), (L,)),
                              mode="clip").sum() for d in range(D)]
            return sum(parts)

        t = timeit(f_chain, cols, x)
        print(f"8-chained take+sum: {t*1e3:.1f} ms ({t/m*1e9:.2f} ns/edge)",
              flush=True)

        @jax.jit
        def f_nomask(c, r, v):
            xg = jnp.take(v, c, mode="clip")
            return jax.ops.segment_sum(xg, r, num_segments=n,
                                       indices_are_sorted=True)

        t = timeit(f_nomask, cols, rows, x)
        print(f"take+sorted segsum (no masks): {t*1e3:.1f} ms "
              f"({t/m*1e9:.2f} ns/edge)", flush=True)

        @jax.jit
        def f_chain_seg(c, r, v):
            parts = []
            for d in range(D):
                cd = jax.lax.dynamic_slice(c, (d * L,), (L,))
                parts.append(jnp.take(v, cd, mode="clip"))
            xg = jnp.concatenate(parts)
            return jax.ops.segment_sum(xg, r, num_segments=n,
                                       indices_are_sorted=True)

        t = timeit(f_chain_seg, cols, rows, x)
        print(f"8-chain take+segsum: {t*1e3:.1f} ms ({t/m*1e9:.2f} ns/edge)",
              flush=True)

        # ---- spmm k8 ----
        k = 8
        B = jnp.ones((n, k), jnp.float32)
        if scale <= 20:
            f_s_cur = jax.jit(lambda A_, B_: sops.spmm(
                sr.PLUS_TIMES_F32, A_, B_))
            t = timeit(f_s_cur, A, B)
            print(f"spmm_k8 current: {t*1e3:.1f} ms ({t/m*1e9:.2f} ns/edge)",
                  flush=True)

        C = max(1, (m * k * 4) // (128 << 20))  # ~128MB gathered per chunk
        while m % C:
            C += 1
        Lc = m // C

        @jax.jit
        def f_s_chunk(c, r, B_):
            def body(i, y):
                c0 = i * Lc
                cd = jax.lax.dynamic_slice(c, (c0,), (Lc,))
                rd = jax.lax.dynamic_slice(r, (c0,), (Lc,))
                Bg = jnp.take(B_, cd, axis=0, mode="clip")
                return y + jax.ops.segment_sum(
                    Bg, rd, num_segments=n, indices_are_sorted=True)

            y0 = jnp.zeros((n, k), jnp.float32)
            return jax.lax.fori_loop(0, C, body, y0)

        t = timeit(f_s_chunk, cols, rows, B)
        print(f"spmm_k8 chunked(C={C}): {t*1e3:.1f} ms "
              f"({t/m*1e9:.2f} ns/edge)", flush=True)


if __name__ == "__main__":
    main()
