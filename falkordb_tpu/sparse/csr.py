"""CSR sparse matrices as static-shaped pytrees.

The workhorse format (the reference's GrB_Matrix role, matrix.rs:304).
TPU-first layout decisions:

  * All arrays have **static padded capacity** (power-of-two buckets) so XLA
    compiles once per bucket, not per mutation.
  * `nnz` is a **device scalar** (traced), so edge insertions/deletions within
    a bucket never trigger recompilation.
  * Alongside `indptr` we store the **expanded per-edge row ids** (`rows`):
    the edge-centric segment-reduce formulation of every semiring op needs
    them, and they make the format equally a sorted COO.  This is the
    "CSR + COO view" hybrid that maps gather → elementwise → segment-reduce
    straight onto the VPU.
  * Padding entries carry row=0/col=0 and are neutralised by masking the
    contribution to the semiring's additive identity — never by sentinel
    indexing, so no +1-slot conventions leak into callers.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def bucket_cap(n: int, minimum: int = 64) -> int:
    """Next power-of-two capacity ≥ n (compile-stability buckets)."""
    c = minimum
    while c < n:
        c <<= 1
    return c


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CSR:
    indptr: jax.Array  # (n_rows+1,) int32
    rows: jax.Array  # (cap,) int32 expanded row ids, sorted ascending
    cols: jax.Array  # (cap,) int32
    vals: Optional[jax.Array]  # (cap,) or None for structural matrices
    nnz: jax.Array  # () int32 device scalar
    n_rows: int = dataclasses.field(metadata=dict(static=True))
    n_cols: int = dataclasses.field(metadata=dict(static=True))

    @property
    def cap(self) -> int:
        return int(self.rows.shape[0])

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    def valid_mask(self) -> jax.Array:
        return jnp.arange(self.cap, dtype=jnp.int32) < self.nnz

    # -- host-side constructors ------------------------------------------------

    @staticmethod
    def from_coo_numpy(
        src,
        dst,
        val=None,
        *,
        shape,
        cap: int | None = None,
        dedup: bool = True,
        sum_duplicates: bool = False,
    ) -> "CSR":
        """Build from host COO arrays; sorts by (row, col).

        dedup='last wins' matches set-pattern semantics; sum_duplicates
        matches GrB_build with plus accumulation."""
        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int64)
        n_rows, n_cols = shape
        if val is not None:
            val = np.asarray(val)
        if not dedup and len(src):
            # native radix-sort CSR build (falkordb_tpu/native) — ~10x
            # numpy argsort on the adjacency-rebuild hot path.  4-byte
            # value payloads ride through the permutation as int32 bits.
            from falkordb_tpu import native as _native

            v4 = val is not None and val.dtype.itemsize == 4
            if val is None or v4:
                got = _native.build_csr_native(
                    src, dst, val.view(np.int32) if v4 else None, n_rows)
                if got is not None:
                    rows32, cols32, vals32, indptr32 = got
                    nnz = len(rows32)
                    cap = cap or bucket_cap(nnz)
                    prows = np.zeros(cap, dtype=np.int32)
                    pcols = np.zeros(cap, dtype=np.int32)
                    prows[:nnz] = rows32
                    pcols[:nnz] = cols32
                    pvals = None
                    if val is not None:
                        pvals = np.zeros(cap, dtype=val.dtype)
                        pvals[:nnz] = vals32.view(val.dtype)
                    return CSR(
                        jnp.asarray(indptr32), jnp.asarray(prows),
                        jnp.asarray(pcols),
                        jnp.asarray(pvals) if pvals is not None else None,
                        jnp.asarray(nnz, dtype=jnp.int32),
                        int(n_rows), int(n_cols),
                    )
        key = (src << 32) | dst
        order = np.argsort(key, kind="stable")
        key, src, dst = key[order], src[order], dst[order]
        if val is not None:
            val = val[order]
        if dedup and len(key):
            if sum_duplicates and val is not None:
                uniq, inv = np.unique(key, return_inverse=True)
                sval = np.zeros(len(uniq), dtype=val.dtype)
                np.add.at(sval, inv, val)
                src, dst, val = (uniq >> 32), (uniq & 0xFFFFFFFF), sval
            else:
                keep = np.ones(len(key), dtype=bool)
                keep[:-1] = key[:-1] != key[1:]  # keep last duplicate
                src, dst = src[keep], dst[keep]
                if val is not None:
                    val = val[keep]
        nnz = len(src)
        cap = cap or bucket_cap(nnz)
        prows = np.zeros(cap, dtype=np.int32)
        pcols = np.zeros(cap, dtype=np.int32)
        prows[:nnz] = src
        pcols[:nnz] = dst
        counts = np.bincount(src.astype(np.int64), minlength=n_rows)
        indptr = np.zeros(n_rows + 1, dtype=np.int32)
        np.cumsum(counts, out=indptr[1:])
        pvals = None
        if val is not None:
            pvals = np.zeros(cap, dtype=val.dtype)
            pvals[:nnz] = val
        return CSR(
            jnp.asarray(indptr),
            jnp.asarray(prows),
            jnp.asarray(pcols),
            jnp.asarray(pvals) if pvals is not None else None,
            jnp.asarray(nnz, dtype=jnp.int32),
            int(n_rows),
            int(n_cols),
        )

    @staticmethod
    def empty(shape, cap: int = 64, dtype=None) -> "CSR":
        n_rows, n_cols = shape
        return CSR(
            jnp.zeros(n_rows + 1, dtype=jnp.int32),
            jnp.zeros(cap, dtype=jnp.int32),
            jnp.zeros(cap, dtype=jnp.int32),
            jnp.zeros(cap, dtype=dtype) if dtype is not None else None,
            jnp.zeros((), dtype=jnp.int32),
            int(n_rows),
            int(n_cols),
        )

    # -- host-side views -------------------------------------------------------

    def host_view(self):
        """Cached host numpy views (indptr, cols, vals) — CSR snapshots
        are immutable, so one device download serves every later query
        (the per-call np.asarray was a fresh transfer each batch)."""
        hv = getattr(self, "_host_view", None)
        if hv is None:
            hv = (np.asarray(self.indptr), np.asarray(self.cols),
                  None if self.vals is None else np.asarray(self.vals))
            object.__setattr__(self, "_host_view", hv)
        return hv

    def to_numpy_coo(self):
        nnz = int(self.nnz)
        r = np.asarray(self.rows)[:nnz]
        c = np.asarray(self.cols)[:nnz]
        v = np.asarray(self.vals)[:nnz] if self.vals is not None else None
        return r, c, v

    def to_scipy(self):
        import scipy.sparse as sp

        r, c, v = self.to_numpy_coo()
        if v is None:
            v = np.ones(len(r), dtype=np.int32)
        return sp.coo_matrix((v, (r, c)), shape=self.shape).tocsr()

    def transpose_host(self, cap: int | None = None) -> "CSR":
        """Build the transpose (host-side; the graph layer caches it the way
        the reference caches `mt`, tensor.rs:33-48)."""
        r, c, v = self.to_numpy_coo()
        return CSR.from_coo_numpy(
            c, r, v, shape=(self.n_cols, self.n_rows), cap=cap or self.cap, dedup=False
        )

    def degrees_host(self) -> np.ndarray:
        ip = np.asarray(self.indptr)
        return ip[1:] - ip[:-1]
