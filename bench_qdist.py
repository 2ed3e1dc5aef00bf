"""Sharded-MATCH throughput measurement (VERDICT r3 directive #6).

Builds a graph big enough to cross the auto-routing threshold
(DEFAULT_MIN_EDGES=200K, parallel/qdist.py), then times the same MATCH
expansion queries with the sharded edge-table path OFF vs AUTO on the
visible mesh, verifying result equality.  On a virtual CPU mesh the
devices share host cores, so the sharded path's ratio here measures
dispatch/exchange overhead, not real scaling — the artifact records both
numbers and the routing decision taken.

    QDIST_DEVICES=8 QDIST_OUT=QDIST_r04.json python bench_qdist.py
"""

import json
import os
import sys
import time


def main():
    want = int(os.environ.get("QDIST_DEVICES", "8"))
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={want}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from falkordb_tpu import FalkorDB
    from falkordb_tpu.parallel.qdist import DEFAULT_MIN_EDGES

    out_path = os.environ.get("QDIST_OUT")
    lines = []

    def emit(obj):
        s = json.dumps(obj)
        print(s, flush=True)
        lines.append(s)
        if out_path:
            with open(out_path, "w") as f:
                f.write("\n".join(lines) + "\n")

    n, m = 40_000, 320_000
    assert m >= DEFAULT_MIN_EDGES
    rng = np.random.default_rng(11)
    g = FalkorDB().select_graph("qdist_bench")
    out = g.bulk_insert(nodes=[(
        ["N"], n, {"id": list(range(n))})])
    ids = out["node_ids"][0]
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    g.bulk_insert(edges=[("E", ids[src], ids[dst], None)])
    emit({"metric": "qdist_graph", "nodes": n, "edges": m,
          "auto_threshold": DEFAULT_MIN_EDGES,
          "devices": len(jax.devices())})

    queries = [
        ("one_hop_count", "MATCH (a:N)-[:E]->(b) WHERE a.id < 2000 "
         "RETURN count(b)"),
        ("two_hop_count", "MATCH (a:N {id: 7})-[:E]->()-[:E]->(c) "
         "RETURN count(c)"),
        ("varlen_count", "MATCH (a:N {id: 7})-[:E*1..2]->(b) "
         "RETURN count(b)"),
        ("undirected", "MATCH (a:N {id: 42})-[:E]-(b) RETURN count(b)"),
    ]

    results = {}
    for mode in ("0", "auto", "force"):
        os.environ["FALKOR_DIST_QUERY"] = mode
        try:
            for name, q in queries:
                g.query(q)  # warm (plan + first kernel compile)
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    r = g.query(q)
                    best = min(best, time.perf_counter() - t0)
                results.setdefault(name, {})[mode] = (
                    best, tuple(map(tuple, r.result_set)))
                emit({"metric": f"qdist_{name}",
                      "mode": {"0": "local", "auto": "auto_routed",
                               "force": "forced_sharded"}[mode],
                      "ms": round(best * 1e3, 2)})
        finally:
            os.environ.pop("FALKOR_DIST_QUERY", None)

    all_equal = all(v["0"][1] == v["auto"][1] == v["force"][1]
                    for v in results.values())
    emit({"metric": "qdist_equality", "ok": all_equal,
          "note": "sharded path must emit the local path's exact results"})
    for name, v in results.items():
        emit({"metric": f"qdist_{name}_ratio",
              "auto_over_local": round(v["auto"][0] / v["0"][0], 2),
              "forced_sharded_over_local": round(
                  v["force"][0] / v["0"][0], 2)})
    if not all_equal:
        raise SystemExit("sharded results differ from local")


if __name__ == "__main__":
    sys.exit(main())
