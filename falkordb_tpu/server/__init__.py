"""L6' — network host: RESP-compatible TCP server + client.

Replaces the reference's Redis-module embedding (src/lib.rs redis_module!)
with a standalone server speaking the same GRAPH.* command set and the same
compact/verbose reply encodings (src/reply.rs), so existing FalkorDB
clients can point at it."""

from falkordb_tpu.server.server import GraphServer  # noqa: F401
from falkordb_tpu.server.client import connect  # noqa: F401
