"""L1' parity tests: semiring ops vs scipy/numpy oracles.

Mirrors the reference's GraphBLAS-result-parity bar (BASELINE.md: allclose
for FP semirings, exact for bool/int)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from falkordb_tpu.sparse import (
    CSR,
    COO,
    DeltaMatrix,
    ANY_PAIR_BOOL,
    MIN_PLUS_F32,
    PLUS_TIMES_F32,
    PLUS_PAIR_I32,
    mxv,
    vxm,
    spmm,
    masked_vxm,
)
from falkordb_tpu.sparse.ops import (
    ewise_mult_mask,
    ewise_anti_mask,
    ewise_add_host,
    reduce_rows,
    reduce_scalar,
    expand,
    select,
)
from falkordb_tpu.sparse.semiring import register_semiring


def random_csr(rng, n=50, m=60, density=0.1, valued=True):
    mat = sp.random(n, m, density=density, random_state=np.random.RandomState(42),
                    dtype=np.float32)
    mat = mat.tocoo()
    vals = mat.data if valued else None
    return CSR.from_coo_numpy(mat.row, mat.col, vals, shape=(n, m)), mat.tocsr()


def test_csr_roundtrip(rng):
    A, S = random_csr(rng)
    assert int(A.nnz) == S.nnz
    assert np.allclose(A.to_scipy().toarray(), S.toarray())


def test_mxv_plus_times(rng):
    A, S = random_csr(rng)
    x = rng.standard_normal(60).astype(np.float32)
    y = mxv(PLUS_TIMES_F32, A, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), S @ x, rtol=1e-5, atol=1e-5)


def test_vxm_plus_times(rng):
    A, S = random_csr(rng)
    x = rng.standard_normal(50).astype(np.float32)
    y = vxm(PLUS_TIMES_F32, jnp.asarray(x), A)
    np.testing.assert_allclose(np.asarray(y), x @ S, rtol=1e-4, atol=1e-4)


def test_mxv_min_plus(rng):
    A, S = random_csr(rng, density=0.2)
    x = rng.standard_normal(60).astype(np.float32)
    y = np.asarray(mxv(MIN_PLUS_F32, A, jnp.asarray(x)))
    D = S.toarray()
    expect = np.full(50, np.inf, dtype=np.float32)
    for i in range(50):
        js = np.nonzero(D[i])[0]
        if len(js):
            expect[i] = np.min(D[i, js] + x[js])
    np.testing.assert_allclose(y, expect, rtol=1e-5)


def test_any_pair_structural(rng):
    A, S = random_csr(rng, valued=False)
    x = (rng.random(60) < 0.3).astype(np.int32)
    y = np.asarray(mxv(ANY_PAIR_BOOL, A, jnp.asarray(x)))
    expect = ((S.toarray() != 0) @ (x != 0)).astype(bool)
    np.testing.assert_array_equal(y != 0, expect)


def test_plus_pair_counts_edges(rng):
    A, S = random_csr(rng)
    ones = jnp.ones(60, dtype=jnp.int32)
    y = np.asarray(mxv(PLUS_PAIR_I32, A, ones))
    np.testing.assert_array_equal(y, (S != 0).sum(axis=1).A1)


def test_spmm(rng):
    A, S = random_csr(rng)
    B = rng.standard_normal((60, 8)).astype(np.float32)
    Y = spmm(PLUS_TIMES_F32, A, jnp.asarray(B))
    np.testing.assert_allclose(np.asarray(Y), S @ B, rtol=1e-4, atol=1e-4)


def test_masked_vxm_complement(rng):
    A, S = random_csr(rng, valued=False)
    x = np.zeros(50, dtype=np.int32)
    x[:5] = 1
    mask = (rng.random(60) < 0.5).astype(np.int32)
    y = np.asarray(masked_vxm(ANY_PAIR_BOOL, jnp.asarray(x), A, jnp.asarray(mask),
                              complement=True))
    reach = ((x != 0) @ (S.toarray() != 0)).astype(bool)
    expect = np.logical_and(reach, mask == 0)
    np.testing.assert_array_equal(y != 0, expect)


def test_ewise_masks(rng):
    A, SA = random_csr(rng, density=0.15)
    B, SB = random_csr(rng, density=0.15)
    # identical patterns since same seed; perturb B by dropping some entries
    rb, cb, vb = B.to_numpy_coo()
    keep = np.arange(len(rb)) % 2 == 0
    B2 = CSR.from_coo_numpy(rb[keep], cb[keep], vb[keep], shape=B.shape)
    inter = np.asarray(ewise_mult_mask(A, B2))
    anti = np.asarray(ewise_anti_mask(A, B2))
    ra, ca, _ = A.to_numpy_coo()
    b_keys = set(zip(rb[keep].tolist(), cb[keep].tolist()))
    for i in range(int(A.nnz)):
        in_b = (ra[i], ca[i]) in b_keys
        assert bool(inter[i]) == in_b
        assert bool(anti[i]) == (not in_b)


def test_ewise_add_union(rng):
    A, SA = random_csr(rng, density=0.1)
    rb = np.array([0, 1, 2])
    cb = np.array([0, 1, 2])
    vb = np.array([9.0, 9.0, 9.0], dtype=np.float32)
    B = CSR.from_coo_numpy(rb, cb, vb, shape=A.shape)
    U = ewise_add_host(A, B)
    expect = SA.toarray().copy()
    expect[rb, cb] = 9.0  # last-wins dedup
    np.testing.assert_allclose(U.to_scipy().toarray(), expect, rtol=1e-6)


def test_reduce(rng):
    A, S = random_csr(rng)
    r = np.asarray(reduce_rows(PLUS_TIMES_F32, A))
    np.testing.assert_allclose(r, S.sum(axis=1).A1, rtol=1e-5)
    tot = float(reduce_scalar(PLUS_TIMES_F32, A))
    np.testing.assert_allclose(tot, S.sum(), rtol=1e-5)


def test_select_edge_mask(rng):
    A, S = random_csr(rng)
    m = np.asarray(select(A, lambda v: v > 0.5))
    _, _, v = A.to_numpy_coo()
    np.testing.assert_array_equal(m[: len(v)], v > 0.5)


def test_expand_batch(rng):
    src = np.array([0, 0, 1, 2, 2, 2, 4])
    dst = np.array([1, 2, 3, 0, 1, 4, 4])
    eid = np.arange(7, dtype=np.int32)
    A = CSR.from_coo_numpy(src, dst, eid, shape=(5, 5), dedup=False)
    batch = jnp.asarray(np.array([2, 0, 3, 4], dtype=np.int32))
    valid = jnp.asarray(np.array([1, 1, 1, 0], dtype=bool))
    out_row, out_dst, out_val, out_valid, total = expand(
        A.indptr, A.cols, A.vals, batch, valid, out_cap=16
    )
    assert int(total) == 5  # deg(2)=3 + deg(0)=2 + deg(3)=0 + masked row
    got = sorted(
        (int(r), int(d), int(v))
        for r, d, v, ok in zip(out_row, out_dst, out_val, out_valid)
        if ok
    )
    assert got == [(0, 0, 3), (0, 1, 4), (0, 4, 5), (1, 1, 0), (1, 2, 1)]


def test_expand_overflow_reports_total():
    src = np.zeros(10, dtype=np.int64)
    dst = np.arange(10)
    A = CSR.from_coo_numpy(src, dst, None, shape=(2, 10), dedup=False)
    out = expand(A.indptr, A.cols, None, jnp.asarray([0], dtype=jnp.int32),
                 jnp.asarray([True]), out_cap=4)
    assert int(out[4]) == 10  # caller sees overflow and re-runs with bigger cap


def test_delta_matrix_lifecycle():
    d = DeltaMatrix((4, 4))
    d.add_edges([0, 1], [1, 2], [0, 1])
    dp = d.dp
    assert int(dp.nnz) == 2
    assert not d.flush()  # below threshold
    assert d.flush(force=True)
    assert int(d.base.nnz) == 2
    assert d.dp is None
    d.add_edges([2], [3], [2])
    d.flush(deleted_eids=np.array([0]), force=True)
    r, c, v = d.base.to_numpy_coo()
    assert sorted(v.tolist()) == [1, 2]


def test_empty_rows_read_as_identity():
    # regression: segment_max fills receiver-less segments with dtype-min;
    # 'or' monoid must clamp them back to its identity 0
    E = CSR.empty((4, 4))
    y = np.asarray(mxv(ANY_PAIR_BOOL, E, jnp.ones(4, dtype=jnp.int32)))
    np.testing.assert_array_equal(y, np.zeros(4, dtype=np.int32))
    A = CSR.from_coo_numpy([2], [0], None, shape=(4, 4))
    y = np.asarray(mxv(ANY_PAIR_BOOL, A, jnp.ones(4, dtype=jnp.int32)))
    np.testing.assert_array_equal(y != 0, [False, False, True, False])


def test_blocked_ell_roundtrip(rng):
    from falkordb_tpu.sparse.ell import build_blocked_ell

    A, S = random_csr(rng, n=50, m=50, density=0.2)
    ell = build_blocked_ell(np.asarray(A.indptr),
                            np.asarray(A.cols)[: int(A.nnz)], 50)
    assert ell.true_edges == int(A.nnz)
    # reconstruct the edge set from buckets
    got = set()
    for b in ell.buckets:
        ids = np.asarray(b.node_ids)
        mat = np.asarray(b.cols)
        for r in range(len(ids)):
            for c in mat[r]:
                if c < 50:
                    got.add((int(ids[r]), int(c)))
    r_, c_, _ = A.to_numpy_coo()
    assert got == set(zip(r_.tolist(), c_.tolist()))


def test_custom_semiring_registration():
    sr = register_semiring("max", "times", np.float32)
    A = CSR.from_coo_numpy([0, 0], [0, 1], np.array([2.0, 3.0], np.float32),
                           shape=(2, 2))
    y = np.asarray(mxv(sr, A, jnp.asarray(np.array([5.0, 7.0], np.float32))))
    assert y[0] == 21.0  # max(2*5, 3*7)


def test_ell_fast_path_matches_generic(rng, monkeypatch):
    """r5: the blocked-ELL concrete-call route (dense width reduce, B-row
    gathers) must equal the edge-centric segment form for every semiring
    family — the small test graphs sit under _ELL_MIN_EDGES, so force the
    route and diff against the generic path directly."""
    import falkordb_tpu.sparse.ops as sops
    from falkordb_tpu.sparse.semiring import (MIN_PLUS_F32, PLUS_PAIR_I32,
                                              PLUS_TIMES_F32)

    A, S = random_csr(rng, n=80, m=70, density=0.15)
    x = rng.standard_normal(70).astype(np.float32)
    B = rng.standard_normal((70, 8)).astype(np.float32)
    ones = jnp.ones(70, dtype=jnp.int32)

    generic = {
        "mxv_pt": np.asarray(mxv(PLUS_TIMES_F32, A, jnp.asarray(x),
                                 edge_mask=A.valid_mask())),
        "mxv_mp": np.asarray(mxv(MIN_PLUS_F32, A, jnp.asarray(x),
                                 edge_mask=A.valid_mask())),
        "mxv_ap": np.asarray(mxv(ANY_PAIR_BOOL, A, ones,
                                 edge_mask=A.valid_mask())),
        "mxv_pp": np.asarray(mxv(PLUS_PAIR_I32, A, ones,
                                 edge_mask=A.valid_mask())),
        "spmm_pt": np.asarray(spmm(PLUS_TIMES_F32, A, jnp.asarray(B),
                                   edge_mask=A.valid_mask())),
    }
    monkeypatch.setattr(sops, "_ELL_MIN_EDGES", 0)
    fast = {
        "mxv_pt": np.asarray(mxv(PLUS_TIMES_F32, A, jnp.asarray(x))),
        "mxv_mp": np.asarray(mxv(MIN_PLUS_F32, A, jnp.asarray(x))),
        "mxv_ap": np.asarray(mxv(ANY_PAIR_BOOL, A, ones)),
        "mxv_pp": np.asarray(mxv(PLUS_PAIR_I32, A, ones)),
        "spmm_pt": np.asarray(spmm(PLUS_TIMES_F32, A, jnp.asarray(B))),
    }
    for kname in generic:
        np.testing.assert_allclose(fast[kname], generic[kname],
                                   rtol=1e-5, atol=1e-5, err_msg=kname)
