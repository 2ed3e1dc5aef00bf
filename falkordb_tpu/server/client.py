"""Network client with the falkordb-py API shape.

`connect(host, port).select_graph(name).query(...)` — decodes the compact
wire format back into NodeVal/EdgeVal/PathVal values, resolving label /
relation / property ids from procedure calls with cached refresh on miss
(the falkordb-py strategy)."""

from __future__ import annotations

import socket
import threading

from falkordb_tpu.api import QueryResult
from falkordb_tpu.runtime.value import (
    EdgeVal, NodeVal, PathVal, PointVal, VectorF32,
)
from falkordb_tpu.server import resp


class RemoteGraph:
    def __init__(self, client: "RemoteClient", name: str):
        self.client = client
        self.name = name
        self._labels: list[str] = []
        self._reltypes: list[str] = []
        self._props: list[str] = []

    # -- id caches ------------------------------------------------------------

    def _refresh_labels(self):
        r = self.client.execute("GRAPH.QUERY", self.name, "CALL db.labels()",
                                "--compact")
        self._labels = [_s(row[0][1]) for row in r[1]]

    def _refresh_reltypes(self):
        r = self.client.execute("GRAPH.QUERY", self.name,
                                "CALL db.relationshipTypes()", "--compact")
        self._reltypes = [_s(row[0][1]) for row in r[1]]

    def _refresh_props(self):
        r = self.client.execute("GRAPH.QUERY", self.name,
                                "CALL db.propertyKeys()", "--compact")
        self._props = [_s(row[0][1]) for row in r[1]]

    def _label(self, i):
        if i >= len(self._labels):
            self._refresh_labels()
        return self._labels[i]

    def _reltype(self, i):
        if i >= len(self._reltypes):
            self._refresh_reltypes()
        return self._reltypes[i]

    def _prop(self, i):
        if i >= len(self._props):
            self._refresh_props()
        return self._props[i]

    # -- commands -------------------------------------------------------------

    def query(self, q: str, params=None, timeout=None,
              read_only=False) -> QueryResult:
        if params:
            q = _params_prefix(params) + q
        cmd = "GRAPH.RO_QUERY" if read_only else "GRAPH.QUERY"
        args = [cmd, self.name, q, "--compact"]
        if timeout is not None:
            args += ["timeout", str(timeout)]
        raw = self.client.execute(*args)
        return self._decode(raw)

    def ro_query(self, q, params=None, timeout=None):
        return self.query(q, params, timeout, read_only=True)

    def explain(self, q: str) -> str:
        raw = self.client.execute("GRAPH.EXPLAIN", self.name, q)
        return "\n".join(x.decode() if isinstance(x, bytes) else str(x)
                         for x in raw)

    def profile(self, q: str) -> str:
        raw = self.client.execute("GRAPH.PROFILE", self.name, q)
        return "\n".join(x.decode() if isinstance(x, bytes) else str(x)
                         for x in raw)

    def delete(self):
        return self.client.execute("GRAPH.DELETE", self.name)

    def slowlog(self):
        return self.client.execute("GRAPH.SLOWLOG", self.name)

    # -- decoding -------------------------------------------------------------

    def _decode(self, raw) -> QueryResult:
        if len(raw) == 1:
            return QueryResult([], [], _stats_map(raw[0]))
        header_raw, rows_raw, stats_raw = raw
        header = [_s(h[1]) for h in header_raw]
        rows = [[self._value(cell) for cell in row] for row in rows_raw]
        return QueryResult(header, rows, _stats_map(stats_raw))

    def _value(self, cell):
        tag, v = int(cell[0]), cell[1]
        if tag == 1:
            return None
        if tag == 2:
            return _s(v)
        if tag == 3:
            return int(v)
        if tag == 4:
            return _s(v) == "true"
        if tag == 5:
            return float(_s(v))
        if tag == 6:
            return [self._value(x) for x in v]
        if tag == 7:
            eid, tid, src, dst, props = v
            return EdgeVal(int(eid), self._reltype(int(tid)), int(src),
                           int(dst), self._props_map(props))
        if tag == 8:
            nid, label_ids, props = v
            return NodeVal(int(nid), [self._label(int(l)) for l in label_ids],
                           self._props_map(props))
        if tag == 9:
            nodes = self._value(v[0])
            edges = self._value(v[1])
            return PathVal(nodes, edges)
        if tag == 10:
            out = {}
            for i in range(0, len(v), 2):
                out[_s(v[i])] = self._value(v[i + 1])
            return out
        if tag == 11:
            return PointVal(float(_s(v[0])), float(_s(v[1])))
        if tag == 12:
            return VectorF32([float(_s(x) if isinstance(x, bytes) else x)
                              for x in v])
        if tag in (13, 14, 15, 16):
            return int(v)
        return v

    def _props_map(self, props):
        out = {}
        for p in props:
            aid = int(p[0])
            out[self._prop(aid)] = self._value([p[1], p[2]])
        return out


def _s(x):
    return x.decode() if isinstance(x, bytes) else str(x)


def _stats_map(stats_raw) -> dict:
    mapping = {
        "Labels added": "labels_added",
        "Labels removed": "labels_removed",
        "Nodes created": "nodes_created",
        "Properties set": "properties_set",
        "Properties removed": "properties_removed",
        "Relationships created": "relationships_created",
        "Nodes deleted": "nodes_deleted",
        "Relationships deleted": "relationships_deleted",
        "Indices created": "indices_created",
        "Indices deleted": "indices_deleted",
    }
    out = {}
    for s in stats_raw:
        s = _s(s)
        if ":" not in s:
            continue
        k, val = s.split(":", 1)
        k = k.strip()
        val = val.strip()
        if k in mapping:
            out[mapping[k]] = int(val)
        elif k == "Query internal execution time":
            out["run_time_ms"] = float(val.split()[0])
        elif k == "Graph version":
            out["graph_version"] = int(val)
        elif k == "Cached execution":
            out["cached_execution"] = val == "1"
    return out


def _cypher_literal(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_cypher_literal(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ", ".join(f"{k}: {_cypher_literal(x)}"
                               for k, x in v.items()) + "}"
    raise TypeError(f"cannot encode parameter {type(v).__name__}")


def _params_prefix(params: dict) -> str:
    return "CYPHER " + " ".join(
        f"{k}={_cypher_literal(v)}" for k, v in params.items()) + " "


class RemoteClient:
    def __init__(self, host="127.0.0.1", port=6379):
        self.sock = socket.create_connection((host, port))
        self.rfile = self.sock.makefile("rb")
        self.reader = resp.Reader(self.rfile)
        self._lock = threading.Lock()

    def execute(self, *args):
        payload = resp.encode([str(a) for a in args])
        with self._lock:
            self.sock.sendall(payload)
            return self.reader.read()

    def ping(self) -> bool:
        return str(self.execute("PING")) == "PONG"

    def select_graph(self, name: str) -> RemoteGraph:
        return RemoteGraph(self, name)

    def list_graphs(self):
        return [_s(x) for x in self.execute("GRAPH.LIST")]

    def config_get(self, key="*"):
        return self.execute("GRAPH.CONFIG", "GET", key)

    def config_set(self, key, value):
        return self.execute("GRAPH.CONFIG", "SET", key, str(value))

    def close(self):
        self.sock.close()


def connect(host="127.0.0.1", port=6379) -> RemoteClient:
    return RemoteClient(host, port)
