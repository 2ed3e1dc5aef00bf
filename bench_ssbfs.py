"""Single-source BFS latency benchmark (VERDICT r3 directive #3 part 2).

The TPU batch kernel amortizes the HBM gather wall over 2048 lanes but a
single source pays the full batch wall (21.6 s at RMAT-24, r3).  This
measures the framework's single-source LATENCY path — the native
direction-optimizing BFS (native/bfsnative.cpp) that algo.bfs routes to —
on the bench RMAT graphs, against that wall.

Host-only (no TPU).  Writes one JSON line per measurement:

    SSBFS_OUT=SSBFS_r04.json python bench_ssbfs.py
    SSBFS_SCALES=22,24 SSBFS_ROOTS=16 python bench_ssbfs.py
"""

import json
import os
import sys
import time

import numpy as np

from bench import load_rmat, sorted_transpose, forward_sorted, prepare_aux

BATCH_WALL_MS_R3 = 21643.0  # bench.py r3: single-BFS latency = batch wall


def main():
    from falkordb_tpu.native import bfs_single_native, bfs_available

    if not bfs_available():
        print(json.dumps({"metric": "ssbfs_unavailable"}))
        return 1
    scales = [int(s) for s in
              os.environ.get("SSBFS_SCALES", "22,24").split(",")]
    nroots = int(os.environ.get("SSBFS_ROOTS", "8"))
    out_path = os.environ.get("SSBFS_OUT")
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".bench_cache")
    lines = []

    def emit(obj):
        s = json.dumps(obj)
        print(s, flush=True)
        lines.append(s)
        if out_path:
            with open(out_path, "w") as f:
                f.write("\n".join(lines) + "\n")

    for scale in scales:
        t0 = time.time()
        src, dst, n = load_rmat(scale, cache_dir)
        # same degree-sorted id space as the TPU bench kernel
        rip, rcols, perm = sorted_transpose(src, dst, n, scale, cache_dir)
        fip, fcols = forward_sorted(src, dst, n, scale, cache_dir)
        roots = prepare_aux(scale, cache_dir)[0][:nroots]
        outdeg = np.diff(fip)
        emit({"metric": "ssbfs_setup", "scale": scale, "n": n,
              "edges": len(src), "load_s": round(time.time() - t0, 1)})

        walls, teps = [], []
        for root in roots:
            t0 = time.time()
            depth, levels = bfs_single_native(fip, fcols, rip, rcols,
                                              int(root))
            dt = time.time() - t0
            reached_edges = float(outdeg[depth >= 0].sum())
            walls.append(dt)
            teps.append(reached_edges / dt)
        walls = np.array(walls)
        rec = {"metric": f"ssbfs_latency_rmat{scale}",
               "p50_ms": round(float(np.median(walls)) * 1e3, 1),
               "max_ms": round(float(walls.max()) * 1e3, 1),
               "mean_mteps": round(float(np.mean(teps)) / 1e6, 1),
               "roots": nroots, "unit": "ms"}
        if scale == 24:
            rec["batch_wall_ms_r3"] = BATCH_WALL_MS_R3
            rec["speedup_vs_batch_wall"] = round(
                BATCH_WALL_MS_R3 / (float(np.median(walls)) * 1e3), 1)
        emit(rec)

    # Device sparse-frontier floor (VERDICT r5 directive #4): a top-down
    # device BFS must make ONE independent random access per touched edge
    # (the visited/frontier bit by dst) — the v5e has no SparseCore and
    # Mosaic cannot vectorize >1-vreg VMEM gathers (PERF.md r4), so the
    # floor is XLA's pipelined gather, measured 8.6-9.0 ns/access
    # (KBENCH_r05 bare take), plus >=1 dispatch+count-fetch per level
    # through the relay (~70 ms round trip; termination is sequential).
    edges_s24 = 266_000_000
    gather_floor_s = edges_s24 * 8.6e-9
    relay_floor_s = 12 * 0.070
    emit({"metric": "ssbfs_device_floor_rmat24",
          "gather_floor_ms": round(gather_floor_s * 1e3),
          "relay_floor_ms": round(relay_floor_s * 1e3),
          "floor_total_ms": round((gather_floor_s + relay_floor_s) * 1e3),
          "target_ms": 1500, "feasible": False,
          "note": "one random bit-access per edge at the measured "
                  "8.6 ns pipelined-gather floor + 12 sequential "
                  "per-level relay round trips; the 1.5 s target needs "
                  "SparseCore-class hardware or an on-host kernel — the "
                  "native direction-optimizing path IS that kernel "
                  "(176 ms p50), and the TPU remains the batch-"
                  "throughput engine (BENCH GTEPS)"})
    return 0


if __name__ == "__main__":
    sys.exit(main())
