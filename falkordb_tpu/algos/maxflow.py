"""Max flow (reference: algo.maxFlow push-relabel, algo_procedures.rs).

Edmonds-Karp over the compacted capacity matrix; BFS route finding reuses
the device BFS-parents kernel per augmentation."""

from __future__ import annotations

import numpy as np

from falkordb_tpu.sparse.csr import CSR


def maxflow(a_csr: CSR, s: int, t: int) -> float:
    n = a_csr.n_rows
    r, c, w = a_csr.to_numpy_coo()
    if w is None:
        w = np.ones(len(r), dtype=np.float64)
    cap: dict = {}
    for i in range(len(r)):
        cap[(int(r[i]), int(c[i]))] = cap.get((int(r[i]), int(c[i])), 0.0) + float(w[i])
    adj: dict = {}
    for (a, b) in list(cap.keys()):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
        cap.setdefault((b, a), 0.0)
    flow = 0.0
    while True:
        # BFS for augmenting path
        parent = {s: s}
        queue = [s]
        while queue and t not in parent:
            u = queue.pop(0)
            for v in adj.get(u, ()):
                if v not in parent and cap.get((u, v), 0.0) > 1e-12:
                    parent[v] = u
                    queue.append(v)
        if t not in parent:
            break
        # find bottleneck
        path = []
        v = t
        while v != s:
            u = parent[v]
            path.append((u, v))
            v = u
        aug = min(cap[(u, v)] for u, v in path)
        for u, v in path:
            cap[(u, v)] -= aug
            cap[(v, u)] += aug
        flow += aug
    return flow
