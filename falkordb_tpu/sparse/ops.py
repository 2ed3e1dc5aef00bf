"""Semiring sparse ops — edge-centric XLA formulations.

Every op is the same TPU-friendly shape: gather operands per edge →
elementwise multiply (VPU) → segment-reduce by row/col (sorted where the
format allows).  This replaces GraphBLAS mxm/mxv/eWise/select/reduce
(reference: graph/src/graph/graphblas/matrix.rs:604-1149).

Dense vectors represent structural sparsity as the semiring's additive
identity; callers that need an explicit structure mask use the `*_struct`
variants which also return a presence count.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from falkordb_tpu.sparse.csr import CSR, bucket_cap
from falkordb_tpu.sparse.semiring import Semiring


def _edge_vals(A: CSR):
    return A.vals if A.vals is not None else jnp.ones(A.cap, dtype=jnp.int32)


def _neutralize(sr: Semiring, contrib, valid):
    return jnp.where(valid, contrib.astype(sr.dtype), sr.zero)


# ---------------------------------------------------------------------------
# Blocked-ELL fast path (concrete operands only)
#
# KBENCH r4/r5 ground truth on the v5e: the x-gather costs ~9 ns/edge
# (latency floor) but XLA's SORTED segment reduce costs another ~10 ns/edge
# — the reduce, not the gather, was the generic kernels' wall.  Routing
# rows through degree-bucketed dense matrices turns the reduce into a
# width-axis VPU reduction (~free) at ~1.1-1.3x edge padding, and lets
# spmm gather whole B rows (vectorized copy, 2-3 ns/row vs per-element).
# ---------------------------------------------------------------------------

_ELL_MIN_EDGES = 1 << 16  # below this the build cost beats the win
# ~1.3-ratio width ladder: sentinel gathers cost a full access each, so
# padding is a direct multiplier on the gather bill (the coarse 10-step
# ladder padded RMAT-22 2.43x; this one 1.23x — measured r5)
_ELL_WIDTHS = (4, 6, 8, 10, 12, 16, 20, 26, 32, 42, 54, 70, 90, 128,
               170, 224, 288, 384, 512, 768, 1024, 1536, 2048, 3072,
               4096, 6144, 8192, 12288, 16384, 24576, 32768)
_ELL_TEMP_BYTES = 192 << 20  # per-bucket gather temp cap (row-chunking)


def _ell_form(A: CSR, need_vals: bool):
    """(cols_mat[, vals_mat]) device buckets + inverse permutation,
    cached on the CSR (immutable snapshot).  cols padding sentinel =
    n_cols (x is padded by one zero row); vals padding = 0.  The valued
    form reuses the structural form's cols/inv (only vals matrices are
    extra), so structural+valued semirings on one CSR don't duplicate
    the padded cols in device memory."""
    key = "_ell_form_v" if need_vals else "_ell_form"
    cached = getattr(A, key, None)
    if cached is not None:
        return cached
    if need_vals:
        base = getattr(A, "_ell_form", None)
        if base is not None:
            bbuckets, inv = base
            form = (_attach_vals(A, bbuckets), inv)
            object.__setattr__(A, key, form)
            return form
    indptr, cols, vals = A.host_view()
    n = A.n_rows
    buckets = []
    sels = []
    for sel, w, rep_rows, within, src_pos in _ell_buckets(A, indptr):
        mat = np.full((len(sel), w), A.n_cols, dtype=np.int32)
        mat[rep_rows, within] = cols[src_pos]
        vm = None
        if need_vals:
            vmat = np.zeros((len(sel), w), dtype=np.float32)
            vmat[rep_rows, within] = (vals[src_pos] if vals is not None
                                      else 1.0)
            vm = jnp.asarray(vmat)
        sels.append(sel)
        buckets.append((jnp.asarray(mat), vm, w))
    # one inverse-permutation GATHER assembles y from the concatenated
    # bucket results — a per-bucket .at[ids].set scatter ran 10-50x
    # behind streaming and dominated at n=4M (KBENCH r5 scale-22)
    order = (np.concatenate(sels) if sels else np.zeros(0, np.int64))
    inv = np.full(n, len(order), dtype=np.int32)  # sentinel = zero row
    inv[order] = np.arange(len(order), dtype=np.int32)
    inv = jnp.asarray(inv)
    form = (buckets, inv)
    object.__setattr__(A, key, form)
    if need_vals:
        # share cols/inv with the structural form for later callers
        object.__setattr__(A, "_ell_form",
                           (tuple((m, None, w) for m, _, w in buckets),
                            inv))
    return form


def _ell_buckets(A: CSR, indptr):
    """Shared bucket walk: yields (sel, width, rep_rows, within, src_pos)
    per non-empty degree bucket — the SINGLE source of bucket/row
    alignment for cols (_ell_form) and vals (_attach_vals); two copies
    of this math drifting apart would silently misalign weighted
    semirings."""
    deg = indptr[1:] - indptr[:-1]
    max_deg = int(deg.max()) if A.n_rows else 0
    ws = [w for w in _ELL_WIDTHS if w < max_deg] + (
        [max_deg] if max_deg else [])
    lo = 0
    for w in ws:
        sel = np.nonzero((deg > lo) & (deg <= w))[0]
        lo = w
        if len(sel) == 0:
            continue
        dsel = deg[sel]
        total = int(dsel.sum())
        rep_rows = np.repeat(np.arange(len(sel)), dsel)
        within = np.arange(total) - np.repeat(np.cumsum(dsel) - dsel, dsel)
        src_pos = np.repeat(indptr[sel], dsel) + within
        yield sel, w, rep_rows, within, src_pos


def _attach_vals(A: CSR, bbuckets):
    """Vals matrices in the structural form's bucket layout (one extra
    host pass; cols matrices are shared, not copied)."""
    indptr, _, vals = A.host_view()
    out = []
    for bi, (sel, w, rep_rows, within, src_pos) in enumerate(
            _ell_buckets(A, indptr)):
        mat, _, _ = bbuckets[bi]
        vmat = np.zeros((len(sel), w), dtype=np.float32)
        vmat[rep_rows, within] = (vals[src_pos] if vals is not None
                                  else 1.0)
        out.append((mat, jnp.asarray(vmat), w))
    return tuple(out)


def _row_reduce(sr: Semiring, contrib, axis):
    if sr.add == "plus":
        return jnp.sum(contrib, axis=axis)
    if sr.add == "min":
        return jnp.min(contrib, axis=axis)
    return jnp.max(contrib, axis=axis)  # max / or / any


@partial(jax.jit, static_argnames=("sr",))
def _mxv_ell_jit(sr, buckets, inv, xp):
    """All buckets in ONE program (one relay compile per semiring/shape
    set): per bucket, row-chunked x-gather + dense width reduce; output
    assembled with one inverse-permutation gather (zero scatter)."""
    red = []
    for mat, vmat in buckets:
        rows, w = mat.shape
        blk = max(1, min(rows, _ELL_TEMP_BYTES // max(w * 8, 1)))
        for r0 in range(0, rows, blk):
            sub = mat[r0:r0 + blk]
            xg = jnp.take(xp, sub, mode="clip")
            ev = vmat[r0:r0 + blk] if vmat is not None else jnp.ones(
                (), jnp.int32)
            contrib = sr.multiply(ev, xg)
            contrib = jnp.where(sub == xp.shape[0] - 1, sr.zero,
                                contrib.astype(sr.dtype))
            red.append(_row_reduce(sr, contrib, 1))
    creds = jnp.concatenate(
        red + [jnp.full(1, sr.zero, dtype=sr.dtype)])
    return jnp.take(creds, inv, mode="clip")


def _mxv_ell(sr: Semiring, A: CSR, x: jax.Array):
    need_vals = sr.mul in ("times", "plus", "min", "max", "and", "first")
    buckets, inv = _ell_form(A, need_vals)
    xp = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
    return _mxv_ell_jit(sr, tuple((m, v) for m, v, _ in buckets), inv, xp)


@partial(jax.jit, static_argnames=("sr", "k"))
def _spmm_ell_jit(sr, buckets, inv, Bp, *, k):
    red = []
    for mat, vmat in buckets:
        rows, w = mat.shape
        blk = max(1, min(rows, _ELL_TEMP_BYTES // max(w * k * 8, 1)))
        for r0 in range(0, rows, blk):
            sub = mat[r0:r0 + blk]
            Bg = jnp.take(Bp, sub, axis=0, mode="clip")  # (blk, w, k)
            ev = (vmat[r0:r0 + blk, :, None] if vmat is not None
                  else jnp.ones((), jnp.int32))
            contrib = sr.multiply(ev, Bg)
            contrib = jnp.where((sub == Bp.shape[0] - 1)[..., None],
                                sr.zero, contrib.astype(sr.dtype))
            red.append(_row_reduce(sr, contrib, 1))
    creds = jnp.concatenate(
        red + [jnp.full((1, k), sr.zero, dtype=sr.dtype)])
    return jnp.take(creds, inv, axis=0, mode="clip")


def _spmm_ell(sr: Semiring, A: CSR, B: jax.Array):
    need_vals = sr.mul in ("times", "plus", "min", "max", "and", "first")
    buckets, inv = _ell_form(A, need_vals)
    k = int(B.shape[1])
    Bp = jnp.concatenate([B, jnp.zeros((1, k), B.dtype)], axis=0)
    return _spmm_ell_jit(sr, tuple((m, v) for m, v, _ in buckets),
                         Bp=Bp, inv=inv, k=k)


# ---------------------------------------------------------------------------
# SpMV family
# ---------------------------------------------------------------------------


def mxv(sr: Semiring, A: CSR, x: jax.Array, edge_mask: Optional[jax.Array] = None):
    """y = A ⊗.⊕ x  — y[i] = ⊕_j mul(A[i,j], x[j]).

    Concrete (non-traced) calls route through the cached blocked-ELL
    form: the per-row monoid reduce becomes a DENSE width-axis reduce
    (r5 KBENCH finding: XLA's sorted segment reduce costs ~10 ns/edge —
    MORE than the 9 ns x-gather it follows; the dense reduce is free).
    Traced calls and masked calls keep the edge-centric segment form."""
    if edge_mask is None and not isinstance(
            A.cols, jax.core.Tracer) and A.cap >= _ELL_MIN_EDGES:
        return _mxv_ell(sr, A, x)
    valid = A.valid_mask()
    if edge_mask is not None:
        valid = jnp.logical_and(valid, edge_mask)
    xg = jnp.take(x, A.cols, mode="clip")
    contrib = _neutralize(sr, sr.multiply(_edge_vals(A), xg), valid)
    return sr.segment_reduce(contrib, A.rows, A.n_rows, indices_are_sorted=True)


def vxm(sr: Semiring, x: jax.Array, A: CSR, edge_mask: Optional[jax.Array] = None):
    """y = xᵀ ⊗.⊕ A — y[j] = ⊕_i mul(A[i,j], x[i]).  Unsorted segment reduce.

    For hot paths prefer mxv over a cached transpose (the reference caches
    `mt` the same way, tensor.rs:33-48)."""
    valid = A.valid_mask()
    if edge_mask is not None:
        valid = jnp.logical_and(valid, edge_mask)
    xg = jnp.take(x, A.rows, mode="clip")
    contrib = _neutralize(sr, sr.multiply(_edge_vals(A), xg), valid)
    return sr.segment_reduce(contrib, A.cols, A.n_cols, indices_are_sorted=False)


def masked_vxm(
    sr: Semiring,
    x: jax.Array,
    A: CSR,
    mask: jax.Array,
    complement: bool = False,
    edge_mask: Optional[jax.Array] = None,
):
    """vxm with an output mask (the reference's masked mxm with optional
    complemented mask, matrix.rs:1149).  mask is a dense 0/1 vector over
    columns; masked-out outputs become the semiring identity."""
    y = vxm(sr, x, A, edge_mask=edge_mask)
    keep = mask == 0 if complement else mask != 0
    return jnp.where(keep, y, sr.zero)


def masked_mxv(
    sr: Semiring,
    A: CSR,
    x: jax.Array,
    mask: jax.Array,
    complement: bool = False,
    edge_mask: Optional[jax.Array] = None,
):
    y = mxv(sr, A, x, edge_mask=edge_mask)
    keep = mask == 0 if complement else mask != 0
    return jnp.where(keep, y, sr.zero)


def spmm(sr: Semiring, A: CSR, B: jax.Array, edge_mask: Optional[jax.Array] = None):
    """Y = A ⊗.⊕ B with dense B (n_cols, k) → (n_rows, k).

    Concrete calls route through blocked-ELL: B-ROW gathers (32-256 B)
    run at the 2-3 ns/row vectorized-copy rate instead of per-element,
    and the (rows, w, k) reduce is dense — r5 KBENCH: ~20x over the
    segment form.  Traced/masked calls keep the edge-centric form."""
    if edge_mask is None and not isinstance(
            A.cols, jax.core.Tracer) and A.cap >= _ELL_MIN_EDGES:
        return _spmm_ell(sr, A, B)
    valid = A.valid_mask()
    if edge_mask is not None:
        valid = jnp.logical_and(valid, edge_mask)
    Bg = jnp.take(B, A.cols, axis=0, mode="clip")  # (cap, k)
    ev = _edge_vals(A)[:, None]
    contrib = sr.multiply(ev, Bg)
    contrib = jnp.where(valid[:, None], contrib.astype(sr.dtype), sr.zero)
    return sr.segment_reduce(contrib, A.rows, A.n_rows, indices_are_sorted=True)


# ---------------------------------------------------------------------------
# Element-wise ops (sorted-merge on device via searchsorted over compound keys)
# ---------------------------------------------------------------------------


def _keys(rows, cols):
    return (rows.astype(jnp.int64) << 32) | cols.astype(jnp.int64)


def ewise_mult_mask(A: CSR, B: CSR) -> jax.Array:
    """Structural intersection of A with B, returned as an edge mask over A's
    entries (A ∧ B pattern).  Both must be row-sorted.  Device-side binary
    search per A-edge — O(nnz·log nnz), static shapes."""
    ka = _keys(A.rows, A.cols)
    kb = _keys(B.rows, B.cols)
    # B's padding keys are 0; make them +inf-ish so they never match
    bvalid = B.valid_mask()
    kb = jnp.where(bvalid, kb, jnp.iinfo(jnp.int64).max)
    kb = jnp.sort(kb)
    pos = jnp.searchsorted(kb, ka)
    pos = jnp.clip(pos, 0, kb.shape[0] - 1)
    hit = jnp.take(kb, pos) == ka
    return jnp.logical_and(hit, A.valid_mask())


def ewise_anti_mask(A: CSR, B: CSR) -> jax.Array:
    """Edge mask over A of entries NOT present in B (A \\ B pattern) — the
    delta-minus complement step of delta_lmxm (matrix.rs:1149)."""
    return jnp.logical_and(
        jnp.logical_not(ewise_mult_mask(A, B)), A.valid_mask()
    )


def ewise_add_host(A: CSR, B: CSR, combine="last") -> CSR:
    """Structural/value union (host-side rebuild; used at delta-merge commit
    boundaries, not in query hot paths)."""
    ra, ca, va = A.to_numpy_coo()
    rb, cb, vb = B.to_numpy_coo()
    r = np.concatenate([ra, rb])
    c = np.concatenate([ca, cb])
    v = None
    if va is not None or vb is not None:
        if va is None:
            va = np.ones(len(ra), dtype=vb.dtype)
        if vb is None:
            vb = np.ones(len(rb), dtype=va.dtype)
        v = np.concatenate([va, vb])
    return CSR.from_coo_numpy(
        r, c, v, shape=A.shape, cap=bucket_cap(len(r), A.cap), dedup=True,
        sum_duplicates=(combine == "plus"),
    )


# ---------------------------------------------------------------------------
# Apply / select / reduce
# ---------------------------------------------------------------------------


def apply(A: CSR, fn) -> CSR:
    """Unary op over values, same pattern (GrB_apply)."""
    import dataclasses

    return dataclasses.replace(A, vals=fn(_edge_vals(A)))


def select(A: CSR, pred) -> jax.Array:
    """GxB_select analogue: edge mask of entries whose value passes pred.
    Composes with the edge_mask parameter of the SpMV family."""
    return jnp.logical_and(pred(_edge_vals(A)), A.valid_mask())


def reduce_rows(sr: Semiring, A: CSR, edge_mask: Optional[jax.Array] = None):
    valid = A.valid_mask()
    if edge_mask is not None:
        valid = jnp.logical_and(valid, edge_mask)
    contrib = _neutralize(sr, _edge_vals(A), valid)
    return sr.segment_reduce(contrib, A.rows, A.n_rows, indices_are_sorted=True)


def reduce_scalar(sr: Semiring, A: CSR, edge_mask: Optional[jax.Array] = None):
    valid = A.valid_mask()
    if edge_mask is not None:
        valid = jnp.logical_and(valid, edge_mask)
    contrib = _neutralize(sr, _edge_vals(A), valid)
    if sr.add == "plus":
        return jnp.sum(contrib)
    if sr.add == "min":
        return jnp.min(contrib)
    return jnp.max(contrib)


# ---------------------------------------------------------------------------
# Batched CSR row expansion — the traversal workhorse
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("out_cap",))
def expand(
    indptr: jax.Array,
    cols: jax.Array,
    vals: Optional[jax.Array],
    srcs: jax.Array,
    src_valid: jax.Array,
    out_cap: int,
):
    """Gather the adjacency lists of a batch of source nodes into a flat
    padded edge frame.

    This is the TPU-native replacement for the reference's frontier-matrix
    build + delta_lmxm + result iteration (ops/cond_traverse.rs:439): instead
    of materialising a sparse frontier matrix, we vectorise CSR row slicing —
    degree cumsum → searchsorted to assign output slots → fused gathers.

    Returns (out_row, out_dst, out_val, out_valid, total):
      out_row[k]  — index into the source batch that produced slot k
      out_dst[k]  — destination node id
      out_val[k]  — edge value (edge id) or 0 if vals is None
      out_valid[k]— slot holds a real edge
      total       — number of real edges (host checks overflow vs out_cap)
    """
    B = srcs.shape[0]
    srcs_c = jnp.clip(srcs, 0, indptr.shape[0] - 2)
    start = jnp.take(indptr, srcs_c)
    deg = jnp.take(indptr, srcs_c + 1) - start
    deg = jnp.where(src_valid, deg, 0)
    offsets = jnp.cumsum(deg)
    total = offsets[-1] if B > 0 else jnp.zeros((), jnp.int32)
    k = jnp.arange(out_cap, dtype=jnp.int32)
    row = jnp.searchsorted(offsets, k, side="right").astype(jnp.int32)
    out_valid = k < total
    rowc = jnp.clip(row, 0, B - 1)
    row_start = offsets[rowc] - deg[rowc]
    epos = start[rowc] + (k - row_start)
    epos = jnp.clip(epos, 0, cols.shape[0] - 1)
    out_dst = jnp.take(cols, epos)
    out_val = jnp.take(vals, epos) if vals is not None else jnp.zeros(out_cap, jnp.int32)
    out_row = jnp.where(out_valid, rowc, -1)
    out_dst = jnp.where(out_valid, out_dst, -1)
    return out_row, out_dst, out_val, out_valid, total
