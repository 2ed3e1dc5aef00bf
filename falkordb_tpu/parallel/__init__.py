"""Multi-chip distribution — 2D edge-partitioned graph kernels.

The reference's only 'distributed' axes are Redis replication + OSS-cluster
key sharding (SURVEY.md §2.3); the TPU-native design scales a SINGLE graph
across chips: adjacency edge-partitioned over a device mesh, frontier/rank
vectors exchanged with XLA collectives (psum/all_gather) under shard_map,
ICI-first layout (BASELINE.md north star)."""

from falkordb_tpu.parallel.dist import (  # noqa: F401
    make_mesh,
    make_mesh_2d,
    dist_pagerank_step,
    dist_bfs_level,
    dist_pagerank,
    dist_bfs,
    dist_bfs_2d,
    dist_bfs_fused,
    dist_bfs_fused_bitmap,
    dist_sssp,
    dist_wcc,
    shard_edges_1d,
    shard_edges_2d,
)
