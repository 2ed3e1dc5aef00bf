"""Weak-scaling harness: distributed BFS / PageRank edges-per-second at
1..N devices (BASELINE.md scaling measurement points; reference §2.3's
"distributed test without a cluster" pattern, lifted to a device mesh).

Weak scaling: the RMAT problem doubles with the device count (constant
edges per device), so ideal scaling is flat time and efficiency(N) =
(edges/s at N) / (N * edges/s at 1).

Runs on whatever devices are visible.  With one real TPU chip (or for a
hermetic CI run) use the virtual CPU mesh:

    SCALING_DEVICES=8 python bench_scaling.py        # virtual CPU mesh
    python bench_scaling.py                          # real devices

Prints one JSON line per (kernel, n_devices) point plus a summary line
with weak-scaling efficiency per kernel.
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

    devs = jax.devices()
    base_scale = int(os.environ.get("SCALING_SCALE", "14"))
    kernels = os.environ.get("SCALING_KERNELS", "bfs,pagerank").split(",")
    points = []
    n_dev = 1
    while n_dev <= len(devs):
        points.append(n_dev)
        n_dev *= 2

    results = {k: {} for k in kernels}
    for nd in points:
        scale = base_scale + int(np.log2(nd))
        src, dst, n = rmat_edges(scale)
        m = len(src)
        mesh = dist.make_mesh(devs[:nd])
        w = np.ones(m, dtype=np.float32)
        for kern in kernels:
            if kern == "bfs":
                run = lambda: dist.dist_bfs(mesh, src, dst, w, n, 1)
            elif kern == "pagerank":
                run = lambda: dist.dist_pagerank(mesh, src, dst, n, iters=10)
            elif kern == "sssp":
                run = lambda: dist.dist_sssp(mesh, src, dst, w, n, 1)
            elif kern == "wcc":
                run = lambda: dist.dist_wcc(mesh, src, dst, n)
            else:
                continue
            out = run()  # compile + warm
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            out = run()
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            eps = m / dt
            results[kern][nd] = eps
            print(json.dumps({
                "metric": f"dist_{kern}_edges_per_s", "value": round(eps),
                "unit": "edges/s", "n_devices": nd, "scale": scale,
                "edges": m, "time_s": round(dt, 4),
            }), flush=True)

    for kern, pts in results.items():
        if 1 in pts and points[-1] in pts and points[-1] > 1:
            nmax = points[-1]
            eff = pts[nmax] / (nmax * pts[1])
            print(json.dumps({
                "metric": f"weak_scaling_efficiency_{kern}",
                "value": round(eff, 3), "unit": "fraction",
                "n_devices": nmax,
            }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
