"""GRAPH.* reply encodings — compact and verbose (reference: src/reply.rs).

Compact value tags (reply.rs:134-345):
  1=NULL 2=STRING 3=INTEGER 4=BOOLEAN("true"/"false") 5=DOUBLE(%.15g str)
  6=ARRAY 7=EDGE[id,type_id,src,dst,props] 8=NODE[id,[label_ids],props]
  9=PATH[[6,nodes],[6,edges]] 10=MAP(flat k,[t,v]) 11=POINT[lat,lon]
  12=VECTORF32[doubles] 13=DATETIME 14=DATE 15=TIME 16=DURATION
Each cell/array element is wrapped as [tag, value]; node/edge property
entries are [attr_id, tag, value] triples (reply.rs:200-230)."""

from __future__ import annotations

import datetime as _dt

import numpy as np

from falkordb_tpu.runtime.value import (
    EdgeVal, NodeVal, PathVal, PointVal, VectorF32,
)


def fmt_g(x: float, precision=15) -> str:
    """C's %.15g formatting (reply.rs format_g)."""
    return f"%.{precision}g" % x


def compact_value(v, core) -> list:
    sc = core.store.schema
    if v is None:
        return [1, None]
    if isinstance(v, bool):
        return [4, "true" if v else "false"]
    if isinstance(v, (int, np.integer)):
        return [3, int(v)]
    if isinstance(v, (float, np.floating)):
        return [5, fmt_g(float(v))]
    if isinstance(v, str):
        return [2, v]
    if isinstance(v, (list, tuple)):
        return [6, [compact_value(x, core) for x in v]]
    if isinstance(v, dict):
        flat = []
        for k, x in v.items():
            flat.append(str(k))
            flat.append(compact_value(x, core))
        return [10, flat]
    if isinstance(v, NodeVal):
        label_ids = [sc.labels.ids[l] for l in v.labels if l in sc.labels.ids]
        props = []
        for k, x in v.properties.items():
            aid = sc.attrs.ids.get(k)
            if aid is not None:
                props.append([aid] + compact_value(x, core))
        return [8, [v.id, label_ids, props]]
    if isinstance(v, EdgeVal):
        tid = sc.reltypes.ids.get(v.relation, 0)
        props = []
        for k, x in v.properties.items():
            aid = sc.attrs.ids.get(k)
            if aid is not None:
                props.append([aid] + compact_value(x, core))
        return [7, [v.id, tid, v.src_node, v.dst_node, props]]
    if isinstance(v, PathVal):
        nodes = [6, [compact_value(n, core) for n in v.nodes]]
        edges = [6, [compact_value(e, core) for e in v.edges]]
        return [9, [nodes, edges]]
    if isinstance(v, PointVal):
        return [11, [fmt_g(v.latitude), fmt_g(v.longitude)]]
    if isinstance(v, VectorF32):
        return [12, [float(x) for x in v.data]]
    if isinstance(v, _dt.datetime):
        return [13, int(v.timestamp())]
    if isinstance(v, _dt.date):
        return [14, int(_dt.datetime(v.year, v.month, v.day,
                                     tzinfo=_dt.timezone.utc).timestamp())]
    if isinstance(v, _dt.time):
        return [15, v.hour * 3600 + v.minute * 60 + v.second]
    if isinstance(v, _dt.timedelta):
        return [16, int(v.total_seconds())]
    return [2, str(v)]


def verbose_value(v, core):
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, np.integer)):
        return int(v)
    if isinstance(v, (float, np.floating)):
        return fmt_g(float(v))
    if isinstance(v, str):
        return v
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_v_str(x, core) for x in v) + "]"
    if isinstance(v, dict):
        return ("{" + ", ".join(f"{k}: {_v_str(x, core)}"
                                for k, x in v.items()) + "}")
    if isinstance(v, NodeVal):
        props = ", ".join(f"{k}: {_v_str(x, core)}"
                          for k, x in v.properties.items())
        labels = "".join(f":{l}" for l in v.labels)
        return f"({labels} {{{props}}})" if props else f"({labels})"
    if isinstance(v, EdgeVal):
        props = ", ".join(f"{k}: {_v_str(x, core)}"
                          for k, x in v.properties.items())
        return f"[:{v.relation} {{{props}}}]" if props else f"[:{v.relation}]"
    if isinstance(v, PathVal):
        return "<path>"
    if isinstance(v, PointVal):
        return f"point({{latitude: {v.latitude}, longitude: {v.longitude}}})"
    if isinstance(v, _dt.timedelta):
        # ISO rendering of the anchored encoding (reply.rs:53 routes
        # verbose durations through Value::format_duration)
        from falkordb_tpu.runtime.temporal import format_duration
        return format_duration(v)
    return str(v)


def _v_str(v, core):
    out = verbose_value(v, core)
    return "NULL" if out is None else str(out)


def stats_strings(stats: dict, version: int, cached: bool) -> list[str]:
    """reply_stats string order (reply.rs:530-620)."""
    out = []
    pairs = [
        ("labels_added", "Labels added"),
        ("labels_removed", "Labels removed"),
        ("nodes_created", "Nodes created"),
        ("properties_set", "Properties set"),
        ("properties_removed", "Properties removed"),
        ("relationships_created", "Relationships created"),
        ("nodes_deleted", "Nodes deleted"),
        ("relationships_deleted", "Relationships deleted"),
        ("indices_created", "Indices created"),
        ("indices_deleted", "Indices deleted"),
    ]
    for key, label in pairs:
        n = stats.get(key, 0)
        if n:
            out.append(f"{label}: {n}")
    out.append(f"Cached execution: {1 if cached else 0}")
    out.append("Query internal execution time: "
               f"{stats.get('run_time_ms', 0.0):.6f} milliseconds")
    out.append(f"Graph version: {version}")
    return out


def encode_result(result, core, compact: bool, cached=False):
    """ResultSummary → RESP-ready nested structure (reply.rs:620-668)."""
    version = core.store.version
    stats = stats_strings(result.stats, version, cached)
    if not result.header:
        return [stats]
    if compact:
        header = [[1, name] for name in result.header]
        rows = [[compact_value(v, core) for v in row]
                for row in result.result_set]
    else:
        header = list(result.header)
        rows = [[verbose_value(v, core) for v in row]
                for row in result.result_set]
    return [header, rows, stats]
