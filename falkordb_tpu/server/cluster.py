"""Multi-server cluster key-sharding: graphs pinned to shards.

The reference deploys as a redis-cluster module: each graph key hashes to
one of 16384 slots, slots partition across shards, and every GRAPH.*
command for a key executes on its owning shard, while UDF libraries are
loaded cluster-wide so any shard can serve them
(/root/reference/tests/flow/test_udf_cluster.py:6-10).

The TPU-native framework's primary scale-out is the device mesh under one
server (SURVEY §2.3.4) — this layer supplies the ORTHOGONAL multi-tenant
axis: many graphs spread over many server processes (each owning its own
chips), with the redis-cluster key→slot contract (CRC16-CCITT, {hash-tag}
extraction) so existing cluster clients compute the same placement."""

from __future__ import annotations

from falkordb_tpu.server.client import RemoteClient, RemoteGraph

NSLOTS = 16384

# CRC16-CCITT (XModem), the redis cluster key hash
_CRC16_TAB = []
for _i in range(256):
    _c = _i << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x1021) if (_c & 0x8000) else (_c << 1)
    _CRC16_TAB.append(_c & 0xFFFF)


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = ((c << 8) & 0xFFFF) ^ _CRC16_TAB[((c >> 8) & 0xFF) ^ b]
    return c


def key_slot(key: str) -> int:
    """Redis cluster slot: CRC16 of the {hash-tag} when present and
    non-empty, else of the whole key."""
    raw = key.encode() if isinstance(key, str) else bytes(key)
    s = raw.find(b"{")
    if s >= 0:
        e = raw.find(b"}", s + 1)
        if e > s + 1:  # empty tags fall back to the whole key
            raw = raw[s + 1: e]
    return crc16(raw) % NSLOTS


class ClusterClient:
    """Routes GRAPH.* commands across shard endpoints by key slot.

    Slots are partitioned into contiguous equal ranges over the shard
    list (the fixed assignment a fresh redis-cluster gets); graph-keyed
    commands go to the owner, GRAPH.LIST/INFO union every shard, and
    GRAPH.UDF / GRAPH.CONFIG SET broadcast (cluster-wide state)."""

    def __init__(self, endpoints):
        self.endpoints = list(endpoints)
        if not self.endpoints:
            raise ValueError("cluster needs at least one endpoint")
        self.clients = [RemoteClient(h, p) for h, p in self.endpoints]
        n = len(self.clients)
        per = NSLOTS // n
        # shard i owns [i*per, (i+1)*per) — last takes the remainder
        self._bounds = [(i * per, (i + 1) * per if i < n - 1 else NSLOTS)
                        for i in range(n)]

    def shard_of(self, key: str) -> int:
        slot = key_slot(key)
        for i, (lo, hi) in enumerate(self._bounds):
            if lo <= slot < hi:
                return i
        return len(self.clients) - 1

    def client_for(self, key: str) -> RemoteClient:
        return self.clients[self.shard_of(key)]

    # ------------------------------------------------------------- commands

    def select_graph(self, name: str) -> RemoteGraph:
        return self.client_for(name).select_graph(name)

    def execute(self, cmd: str, *args):
        """Route one command: keyed → owner; LIST → union; UDF/CONFIG SET
        → broadcast (first reply returned)."""
        c = cmd.upper()
        if c == "GRAPH.LIST":
            return self.list_graphs()
        if c in ("GRAPH.UDF", "GRAPH.CONFIG"):
            action = args[0].upper() if args else ""
            if c == "GRAPH.UDF" and action in ("LOAD", "DELETE", "FLUSH") \
                    or (c == "GRAPH.CONFIG" and action == "SET"):
                out = None
                for cl in self.clients:
                    out = cl.execute(cmd, *args)
                return out
            return self.clients[0].execute(cmd, *args)
        if not args:
            raise ValueError(f"{cmd} requires a graph key")
        return self.client_for(str(args[0])).execute(cmd, *args)

    def list_graphs(self):
        out = []
        for cl in self.clients:
            out.extend(cl.list_graphs())
        return sorted(set(out))

    def udf_load(self, name: str, code: str, replace: bool = False):
        args = ["LOAD"] + (["REPLACE"] if replace else []) + [name, code]
        for cl in self.clients:
            cl.execute("GRAPH.UDF", *args)

    def close(self):
        for cl in self.clients:
            cl.close()
