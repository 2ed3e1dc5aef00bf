"""Mesh routing for algo procedures (SURVEY.md §2.3.4: the TPU-native
distribution axis replacing the reference's cluster key-sharding,
src/graph_core.rs:1465-1505).

`CALL algo.pageRank/bfs/sssp/wcc` read adjacency from the GraphStore
snapshot (compact ids), and when more than one JAX device is visible the
edge list routes through the 1D edge-partitioned shard_map kernels in
falkordb_tpu.parallel.dist; otherwise the single-chip jitted kernels run.

Gate: FALKOR_DIST=0 disables routing (tests pin it for equality checks).
"""

from __future__ import annotations

import os

import jax

from falkordb_tpu.parallel.dist import make_mesh

_cached_mesh = None


def maybe_mesh(min_devices: int = 2):
    """The process-wide algo mesh, or None when distribution is off or the
    host sees a single device (the common 1-chip serving case)."""
    global _cached_mesh
    if os.environ.get("FALKOR_DIST", "1") == "0":
        return None
    devices = jax.devices()
    if len(devices) < min_devices:
        return None
    if _cached_mesh is None or _cached_mesh.devices.size != len(devices):
        _cached_mesh = make_mesh(devices)
    return _cached_mesh
