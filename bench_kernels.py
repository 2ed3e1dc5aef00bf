"""Semiring kernel-efficiency measurement vs the HBM roof (VERDICT r3
directive #5; BASELINE.md:30 "SpMM/SDDMM at speed-of-light memory
bandwidth per chip — semiring kernel suite").

Times the hot semiring kernels (sparse/ops.py mxv/spmm over CSR; the
scatter-free blocked-ELL SpMV) on RMAT graphs on the attached TPU,
reports achieved GB/s against the measured ~400 GB/s streaming roof
(PERF.md), using a MINIMUM-traffic byte model per kernel:

  mxv structural (any_pair):   12 B/edge  (cols + rows + x-gather) + 4n
  mxv weighted (plus_times,
  min_plus):                   16 B/edge  (+ vals)                 + 4n
  spmm k (plus_times):         (12+4k) B/edge                      + 4nk
  ell spmv (plus_times):        8 B/padded-edge (cols + x-gather)  + 4n

The x-gather is RANDOM access, so 100% of the streaming roof is not
reachable for CSR kernels — the point of the artifact is the measured
number and the named worst offender.  Timing: jit + host-fetch sync
(relay's block_until_ready is optimistic; CLAUDE.md).

    KBENCH_OUT=KBENCH_r04.json python bench_kernels.py
    KBENCH_SCALES=20,22 python bench_kernels.py
"""

import json
import os
import sys
import time


def main():
    import numpy as np

    import jax

    # persistent XLA cache: kernels compile in ~60-90 s each through the
    # remote-compile relay (CLAUDE.md); cache across processes
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from bench import load_rmat
    from falkordb_tpu.sparse import csr as csrlib
    from falkordb_tpu.sparse import ell as elllib
    from falkordb_tpu.sparse import ops as sops
    from falkordb_tpu.sparse import semiring as sr

    ROOF = 400e9  # measured v5e streaming GB/s (PERF.md)
    scales = [int(s) for s in
              os.environ.get("KBENCH_SCALES", "20,22").split(",")]
    reps = int(os.environ.get("KBENCH_REPS", "5"))
    out_path = os.environ.get("KBENCH_OUT")
    lines = []

    def emit(obj):
        s = json.dumps(obj)
        print(s, flush=True)
        lines.append(s)
        if out_path:
            with open(out_path, "w") as f:
                f.write("\n".join(lines) + "\n")

    def timeit(fn, *args):
        y = fn(*args)
        float(jnp.sum(y))  # force through the relay
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            y = fn(*args)
            float(jnp.sum(y))
            best = min(best, time.perf_counter() - t0)
        return best

    emit({"metric": "kbench_config", "device": str(jax.devices()[0]),
          "roof_gbps": ROOF / 1e9, "scales": scales, "reps": reps})

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".bench_cache")
    worst = (1.0, None)
    for scale in scales:
        src, dst, n = load_rmat(scale, cache_dir)
        m = len(src)
        w = np.random.default_rng(1).uniform(0.5, 2.0, m).astype(np.float32)
        A = csrlib.CSR.from_coo_numpy(src, dst, None, shape=(n, n))
        Aw = csrlib.CSR.from_coo_numpy(src, dst, w, shape=(n, n))
        cap = A.cap
        x = jnp.asarray(
            np.random.default_rng(2).uniform(size=n).astype(np.float32))
        xi = jnp.asarray((np.arange(n) % 2).astype(np.int32))

        # NOTE r5: no outer jit — concrete calls route through the cached
        # blocked-ELL fast path (sparse/ops.py), which jits internally
        # (one program per semiring); an outer jit would trace the CSR
        # and fall back to the edge-centric segment form.
        runs = [
            ("mxv_any_pair", 12 * cap + 4 * n,
             lambda A_, v: sops.mxv(sr.ANY_PAIR_BOOL, A_, v),
             (A, xi)),
            ("mxv_plus_times", 16 * cap + 4 * n,
             lambda A_, v: sops.mxv(sr.PLUS_TIMES_F32, A_, v),
             (Aw, x)),
            ("mxv_min_plus", 16 * cap + 4 * n,
             lambda A_, v: sops.mxv(sr.MIN_PLUS_F32, A_, v),
             (Aw, x)),
        ]
        for k in (8, 64):
            # r5: the ELL route chunks its gather temps, so the footprint
            # is Y + padded B + the ELL cols/vals, not the (cap, k)
            # per-edge intermediate
            foot = 2 * n * k * 4 + 10 * cap
            if foot > 12 << 30:
                emit({"metric": f"kbench_spmm_plus_times_k{k}",
                      "scale": scale, "skipped": "ELL footprint "
                      f"{foot / 1e9:.0f} GB exceeds HBM"})
                continue
            B = jnp.asarray(np.random.default_rng(3).uniform(
                size=(n, k)).astype(np.float32))
            runs.append((f"spmm_plus_times_k{k}",
                         (12 + 4 * k) * cap + 4 * n * k,
                         lambda A_, B_: sops.spmm(
                             sr.PLUS_TIMES_F32, A_, B_), (Aw, B)))

        # scatter-free blocked-ELL SpMV (transpose layout, dense row sums)
        order = np.argsort(dst, kind="stable")
        csrT_indptr = np.bincount(dst, minlength=n + 1).cumsum()
        csrT_indptr = np.concatenate([[0], csrT_indptr[:-1]]).astype(np.int64)
        ellT = elllib.build_blocked_ell(
            np.concatenate([[0], np.bincount(dst, minlength=n).cumsum()]),
            src[order], n)
        bucket_args = tuple((b.node_ids, b.cols) for b in ellT.buckets)

        @jax.jit
        def ell_spmv(bargs, v):
            vp = jnp.concatenate([v, jnp.zeros(1, jnp.float32)])
            acc = jnp.zeros(ellT.n + 1, dtype=jnp.float32)
            for node_ids, cols in bargs:
                gat = jnp.take(vp, cols, axis=0, mode="clip")
                acc = acc.at[node_ids].set(jnp.sum(gat, axis=1))
            return acc[: ellT.n]

        runs.append(("ell_spmv_plus_times",
                     8 * ellT.padded_edges + 4 * n,
                     ell_spmv, (bucket_args, x)))

        # the packed row-gather (BFS hot op): 16-deep form-B OR chain over
        # (n+1, 128) int16 rows — per-ROW gather cost, the format the
        # framework moves every whole-graph algorithm onto (PERF.md).
        # Byte model: 4 B/index + 256 B/row fetched.
        gidx = jnp.asarray(np.random.default_rng(5).integers(
            0, n, (16, 1 << 21), dtype=np.int32))
        gtab = jnp.asarray(np.random.default_rng(6).integers(
            0, 1 << 15, (n + 1, 128)).astype(np.int16))

        @jax.jit
        def rowgather(tab, idx):
            acc = jnp.take(tab, idx[0], axis=0, mode="clip")
            for j in range(1, 16):
                acc = jnp.bitwise_or(
                    acc, jnp.take(tab, idx[j], axis=0, mode="clip"))
            return acc

        runs.append(("packed_rowgather_or16",
                     (4 + 256) * 16 * (1 << 21),
                     rowgather, (gtab, gidx)))

        for name, nbytes, fn, args in runs:
            dt = timeit(fn, *args)
            gbps = nbytes / dt / 1e9
            eff = gbps / (ROOF / 1e9)
            emit({"metric": f"kbench_{name}", "scale": scale,
                  "edges": m, "cap": cap, "ms": round(dt * 1e3, 2),
                  "model_bytes": nbytes, "achieved_gbps": round(gbps, 1),
                  "efficiency_vs_roof": round(eff, 4)})
            if eff < worst[0]:
                worst = (eff, f"{name}@scale{scale}")

    emit({"metric": "kbench_worst_offender", "kernel": worst[1],
          "efficiency_vs_roof": round(worst[0], 4)})


if __name__ == "__main__":
    sys.exit(main())
