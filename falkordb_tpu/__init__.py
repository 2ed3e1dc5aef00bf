"""falkordb_tpu — a TPU-native sparse graph-algebra engine.

A from-scratch property-graph database with FalkorDB's capability set
(openCypher queries compiled to semiring sparse linear algebra), designed
TPU-first: adjacency lives in static-shaped CSR/COO pytrees, traversal and
graph algorithms run as jitted XLA programs, and multi-chip scaling
uses `jax.sharding` meshes with ICI collectives.

Layer map (mirrors SURVEY.md, reference: /root/reference):
  L1' falkordb_tpu.sparse    — semiring SpMV/SpMM, masked mxm, delta matrices
  L2' falkordb_tpu.graph     — property-graph container, attrs, MVCC versions
  L5' falkordb_tpu.lang      — openCypher lexer/parser/binder/planner
  L4' falkordb_tpu.runtime   — vectorized batch operators + function library
  L3' falkordb_tpu.index     — range / fulltext / vector indexes
      falkordb_tpu.algos     — BFS/PageRank/WCC/SSSP/... (LAGraph equivalent)
      falkordb_tpu.parallel  — multi-chip 2D-partitioned kernels (shard_map)
      falkordb_tpu.server    — RESP-compatible network server + client
      falkordb_tpu.persist   — checkpoint / restore / effects log
"""

__version__ = "0.1.0"

import jax as _jax

# openCypher integers are 64-bit and compound (src<<32|dst) edge keys need
# int64; enable x64 once at import.  Hot kernels pin int32/float32/bfloat16
# explicitly so the TPU compute path never pays for this.
_jax.config.update("jax_enable_x64", True)

import sys as _sys

# recursive-descent parsing + recursive evaluation of deeply nested
# expressions need headroom beyond CPython's default 1000 frames
if _sys.getrecursionlimit() < 20_000:
    _sys.setrecursionlimit(20_000)

from falkordb_tpu.api import FalkorDB, Graph, QueryResult  # noqa: F401
