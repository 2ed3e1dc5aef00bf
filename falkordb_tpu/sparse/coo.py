"""COO sparse buffers — the ingest / delta format.

A static-capacity structure-of-arrays edge list.  Used for bulk ingest and
for the delta-plus / delta-minus pending-update layers (the reference's
VersionedMatrix dp/dm, graph/src/graph/graphblas/versioned_matrix.rs:90).
Capacity is a static shape; `nnz` is a host int so Python-side code can
slice, while device ops mask on an iota < nnz validity test.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class COO:
    src: jax.Array | np.ndarray  # (cap,) int32
    dst: jax.Array | np.ndarray  # (cap,) int32
    val: jax.Array | np.ndarray | None  # (cap,) or None (structural)
    nnz: int = dataclasses.field(metadata=dict(static=True))
    n_rows: int = dataclasses.field(metadata=dict(static=True))
    n_cols: int = dataclasses.field(metadata=dict(static=True))

    @property
    def cap(self) -> int:
        return int(self.src.shape[0])

    @staticmethod
    def from_numpy(src, dst, val=None, *, shape, cap=None) -> "COO":
        src = np.asarray(src, dtype=np.int32)
        dst = np.asarray(dst, dtype=np.int32)
        nnz = len(src)
        cap = cap or max(nnz, 1)
        psrc = np.zeros(cap, dtype=np.int32)
        pdst = np.zeros(cap, dtype=np.int32)
        psrc[:nnz] = src
        pdst[:nnz] = dst
        pval = None
        if val is not None:
            val = np.asarray(val)
            pval = np.zeros(cap, dtype=val.dtype)
            pval[:nnz] = val
        return COO(psrc, pdst, pval, nnz, shape[0], shape[1])

    def keys(self) -> np.ndarray:
        """Compound (src<<32 | dst) keys of the valid entries, host-side.

        Mirrors the reference's compound_key (tensor.rs:150)."""
        s = np.asarray(self.src[: self.nnz], dtype=np.int64)
        d = np.asarray(self.dst[: self.nnz], dtype=np.int64)
        return (s << 32) | d
