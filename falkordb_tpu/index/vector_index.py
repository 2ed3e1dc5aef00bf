"""Vector index — exact brute-force kNN on device.

The reference embeds RediSearch's HNSW (index/mod.rs VectorIndexOptions).
On TPU, exact search is a single (n, d)·(d,) bf16 matmul on the MXU plus a
top-k — bandwidth-bound, trivially batchable, and recall-1.0; graph-walk ANN
structures serialize poorly onto SIMD hardware.  IVF partitioning slots in
later for >10M vectors."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from falkordb_tpu.graph.attrstore import ABSENT
from falkordb_tpu.runtime.value import VectorF32


class VectorIndex:
    def __init__(self, ids, matrix, dim, metric):
        self.ids = ids  # (n,) int64
        self.matrix = matrix  # (n_pad, d) float32 device array
        self.dim = dim
        self.metric = metric  # 'cosine' | 'euclidean'
        self.n = len(ids)

    @staticmethod
    def build(store, d) -> "VectorIndex":
        prop = d.props[0]
        aid = store.schema.attr_id(prop)
        metric = (d.options.get("similarityFunction", "euclidean")
                  if d.options else "euclidean")
        dim = int(d.options.get("dimension", 0)) if d.options else 0
        lid = (store.schema.label_id(d.label) if d.entity == "node"
               else store.schema.reltype_id(d.label))
        ids, vecs = [], []
        if aid is not None and lid is not None:
            attrs = store.node_attrs if d.entity == "node" else store.edge_attrs
            col = attrs.columns.get(aid)
            if col is not None:
                if d.entity == "node":
                    mask = store.label_masks.get(lid)
                    ents = (np.nonzero(mask[: store.node_max])[0]
                            if mask is not None else [])
                else:
                    live = ~store.e_deleted[: store.edge_max]
                    ents = np.nonzero(
                        (store.e_type[: store.edge_max] == lid) & live)[0]
                for i in ents:
                    v = col.data[i]
                    if isinstance(v, VectorF32):
                        if dim and v.data.shape[0] != dim:
                            continue
                        ids.append(int(i))
                        vecs.append(v.data)
        if not vecs:
            return VectorIndex(np.zeros(0, np.int64),
                               jnp.zeros((8, max(dim, 8)), jnp.float32),
                               dim, metric)
        n = len(vecs)
        dvec = vecs[0].shape[0]
        n_pad = max(8, -(-n // 8) * 8)
        M = np.zeros((n_pad, dvec), dtype=np.float32)
        M[:n] = np.stack(vecs)
        return VectorIndex(np.asarray(ids, dtype=np.int64), jnp.asarray(M),
                           dvec, metric)

    def query(self, qvec, k: int):
        if self.n == 0:
            return []
        q = jnp.asarray(np.asarray(qvec, dtype=np.float32))
        M = self.matrix
        if self.metric == "cosine":
            qn = q / (jnp.linalg.norm(q) + 1e-30)
            Mn = M / (jnp.linalg.norm(M, axis=1, keepdims=True) + 1e-30)
            score = Mn @ qn  # similarity
            dist = 1.0 - score
        else:
            d2 = jnp.sum((M - q[None, :]) ** 2, axis=1)
            dist = jnp.sqrt(d2)
        dist = np.asarray(dist)[: self.n]
        k = min(k, self.n)
        idx = np.argpartition(dist, k - 1)[:k]
        idx = idx[np.argsort(dist[idx])]
        return [(int(self.ids[i]), float(dist[i])) for i in idx]
