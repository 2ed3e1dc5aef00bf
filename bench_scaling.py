"""Weak-scaling harness: distributed BFS / PageRank / SSSP edges-per-second
at 1..N devices (BASELINE.md scaling measurement points; reference §2.3's
"distributed test without a cluster" pattern, lifted to a device mesh).

Weak scaling: the RMAT problem doubles with the device count (constant
edges per device), so ideal scaling is flat time and efficiency(N) =
(edges/s at N) / (N * edges/s at 1).

Measured quantities per (kernel, n_devices) point:
  * fused 1D kernel time (whole iteration loop inside ONE XLA program —
    one dispatch, collectives inside; see parallel/dist.py)
  * fused 2D kernel time (bitmap / reduce-scatter exchange) where available
  * analytic per-device collective bytes per iteration for both layouts
  * a zero-collective control (pagerank with the psum elided) isolating
    comm cost from compute

Raw weak-scaling efficiency on a VIRTUAL CPU mesh is bounded above by
ncores/n_devices (the virtual devices share the host's cores: at 8
devices on a 2-core host the hard ceiling is 0.25).  The harness
therefore also reports `core_normalized` efficiency =
eps(N) / (min(N, ncores) * eps(1)), which is the hardware-honest number,
plus comm_efficiency = t(no_comm)/t(full) at max devices.

    SCALING_DEVICES=8 python bench_scaling.py        # virtual CPU mesh
    python bench_scaling.py                          # real devices

Prints one JSON line per measurement; SCALING_OUT=<path> additionally
writes all lines to the artifact file.
"""

import json
import os
import sys
import time


def _setup_devices():
    want = int(os.environ.get("SCALING_DEVICES", "0"))
    if want:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={want}")
    import jax
    if want:
        jax.config.update("jax_platforms", "cpu")
    return jax


def main():
    jax = _setup_devices()
    import numpy as np

    from bench import rmat_edges
    from falkordb_tpu.parallel import dist

    ncores = os.cpu_count() or 1
    devs = jax.devices()
    base_scale = int(os.environ.get("SCALING_SCALE", "14"))
    kernels = os.environ.get(
        "SCALING_KERNELS", "bfs,pagerank,sssp").split(",")
    reps = int(os.environ.get("SCALING_REPS", "3"))
    out_path = os.environ.get("SCALING_OUT")
    lines = []

    def emit(obj):
        s = json.dumps(obj)
        print(s, flush=True)
        lines.append(s)

    points = []
    n_dev = 1
    while n_dev <= len(devs):
        points.append(n_dev)
        n_dev *= 2

    def timeit(fn):
        out = fn()  # compile + warm
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best

    results = {}
    for nd in points:
        scale = base_scale + int(np.log2(nd))
        src, dst, n = rmat_edges(scale)
        m = len(src)
        # fair source across scales: the max-out-degree hub (always in the
        # giant component; a random source can be isolated at one scale and
        # not another, skewing the level count)
        s0 = int(np.bincount(src, minlength=n).argmax())
        w = np.ones(m, dtype=np.float32)
        mesh = dist.make_mesh(devs[:nd])
        mesh2 = dist.make_mesh_2d(devs[:nd])
        shp2 = tuple(mesh2.devices.shape)
        runs = {}
        if "bfs" in kernels:
            runs["bfs_1d"] = lambda: dist.dist_bfs_fused(
                mesh, src, dst, n, s0)
            runs["bfs_1dbm"] = lambda: dist.dist_bfs_fused_bitmap(
                mesh, src, dst, n, s0)
            runs["bfs_2d"] = lambda: dist.dist_bfs_2d_bitmap(
                mesh2, src, dst, n, s0)
        if "pagerank" in kernels:
            runs["pagerank_1d"] = lambda: dist.dist_pagerank_fused(
                mesh, src, dst, n, iters=10)
            runs["pagerank_2d"] = lambda: dist.dist_pagerank_2d(
                mesh2, src, dst, n, iters=10)
            runs["pagerank_nocomm"] = lambda: dist.dist_pagerank_fused(
                mesh, src, dst, n, iters=10, no_comm=True)
        if "sssp" in kernels:
            runs["sssp_1d"] = lambda: dist.dist_sssp_fused(
                mesh, src, dst, w, n, s0)
            runs["sssp_2d"] = lambda: dist.dist_sssp_2d(
                mesh2, src, dst, w, n, s0)
        if "wcc" in kernels:
            runs["wcc_1d"] = lambda: dist.dist_wcc_fused(mesh, src, dst, n)
        for name, fn in runs.items():
            dt = timeit(fn)
            eps = m / dt
            results.setdefault(name, {})[nd] = eps
            kind, layout = name.rsplit("_", 1)
            rec = {
                "metric": f"dist_{name}_edges_per_s", "value": round(eps),
                "unit": "edges/s", "n_devices": nd, "scale": scale,
                "edges": m, "time_s": round(dt, 4),
            }
            if layout in ("1d", "1dbm", "2d"):
                rec["comm_bytes_per_iter_per_dev"] = dist.comm_bytes_per_iter(
                    kind, layout, n,
                    shp2 if layout == "2d" else (nd,))
            emit(rec)

    nmax = points[-1]
    # the largest measured point whose virtual devices map 1:1 onto
    # physical cores — the only point where raw weak-scaling efficiency is
    # a hardware-honest number on a virtual mesh
    nfair = max((p for p in points if p <= ncores), default=1)
    for name, pts in results.items():
        if 1 in pts and nmax in pts and nmax > 1:
            eff = pts[nmax] / (nmax * pts[1])
            eff_core = pts[nmax] / (min(nmax, ncores) * pts[1])
            emit({
                "metric": f"weak_scaling_efficiency_{name}",
                "value": round(eff, 3), "unit": "fraction",
                "n_devices": nmax, "ncores": ncores,
                "raw_ceiling_on_this_host": round(min(1.0, ncores / nmax), 3),
                "core_normalized": round(eff_core, 3),
            })
        if 1 in pts and nfair in pts and nfair > 1:
            emit({
                "metric": f"weak_scaling_efficiency_{name}_at_ncores",
                "value": round(pts[nfair] / (nfair * pts[1]), 3),
                "unit": "fraction", "n_devices": nfair, "ncores": ncores,
                "note": "devices==cores: 1:1 physical mapping",
            })
    if "pagerank_1d" in results and "pagerank_nocomm" in results:
        full = results["pagerank_1d"].get(nmax)
        ctrl = results["pagerank_nocomm"].get(nmax)
        if full and ctrl:
            emit({
                "metric": "comm_efficiency_pagerank",
                "value": round(full / ctrl, 3), "unit": "fraction",
                "n_devices": nmax,
                "note": "t(no_collectives)/t(full) at max devices; 1.0 = "
                        "collectives free",
            })

    if out_path:
        with open(out_path, "w") as f:
            f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    sys.exit(main())
