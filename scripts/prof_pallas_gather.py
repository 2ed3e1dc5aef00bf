"""Pallas probe: can a TPU kernel beat the 12.6 ns/row XLA gather wall?

The BFS pull step is  reach[v] = OR_{u in cols(v)} frontier[u]  — a random
access per edge.  XLA's gather saturates ~20 GB/s effective (PERF.md);
the designed Pallas lever is a bit-packed frontier RESIDENT IN VMEM
(n/32 uint32 words = 2 MB at scale 24 for one lane) with edges streamed
from HBM at the 400 GB/s roof, IF Mosaic can vectorize the in-VMEM random
word load.  This script answers that empirically:

  A. sanity: elementwise kernel compiles/runs through the axon relay
  B. streaming roof inside Pallas: OR-reduce a large int32 array
  C. in-VMEM table gather: out = tab[idx] via jnp.take (the money probe)
  D. bit-test: frontier word gather + shift/mask (full BFS inner op)

Run on CPU first (interpret mode): PALLAS_INTERPRET=1 python ...
Then on the TPU:                    python scripts/prof_pallas_gather.py
"""

import os
import sys
import time
from functools import partial

import numpy as np

import jax

if os.environ.get("PALLAS_INTERPRET"):
    jax.config.update("jax_platforms", "cpu")

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = bool(os.environ.get("PALLAS_INTERPRET"))


def timeit(fn, *args, reps=5):
    y = fn(*args)
    jax.block_until_ready(y)
    float(jnp.sum(y.astype(jnp.float32)))  # force through the relay
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        y = fn(*args)
        float(jnp.sum(y.astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best


def probe(name, fn):
    try:
        dt = fn()
        print(f"PROBE {name}: OK {dt}", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:300]
        print(f"PROBE {name}: FAIL {type(e).__name__}: {msg}", flush=True)


# ---------------------------------------------------------------- A: sanity
def probe_sanity():
    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2

    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    f = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERPRET)
    y = f(x)
    assert np.array_equal(np.asarray(y), np.asarray(x) * 2)
    return "correct"


# ------------------------------------------------------------- B: streaming
def probe_stream(total_mb=512):
    n = total_mb * (1 << 20) // 4
    blk = 512 * 1024 // 4  # 512 KB blocks
    grid = n // blk

    def kern(x_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        r = jnp.bitwise_or(x_ref[0], x_ref[1])
        for i in range(2, 8):
            r = jnp.bitwise_or(r, x_ref[i])
        o_ref[:] = jnp.bitwise_or(o_ref[:], r)

    x = jnp.ones((grid * 8, blk // 8), dtype=jnp.int32)
    f = jax.jit(pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((blk // 8,), jnp.int32),
        grid=(grid,),
        in_specs=[pl.BlockSpec((8, blk // 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((blk // 8,), lambda i: (0,),
                               memory_space=pltpu.VMEM),
        interpret=INTERPRET))
    dt = timeit(f, x)
    return f"{total_mb / dt / 1e3:.0f} GB/s read"


# ---------------------------------------------------- C: in-VMEM take gather
def _take_kernel(tab_ref, idx_ref, o_ref):
    o_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)


def probe_take(tab_words=1 << 19, nidx=1 << 22, seed=0):
    """tab 2 MB uint32 in VMEM; idx streamed; out = tab[idx]."""
    rng = np.random.default_rng(seed)
    tab = jnp.asarray(rng.integers(0, 1 << 30, tab_words, dtype=np.int32))
    idx = jnp.asarray(
        rng.integers(0, tab_words, nidx, dtype=np.int32).reshape(-1, 512))
    grid = idx.shape[0] // 8

    f = jax.jit(pl.pallas_call(
        _take_kernel,
        out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.int32),
        grid=(grid,),
        in_specs=[pl.BlockSpec((tab_words,), lambda i: (0,),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, 512), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 512), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=INTERPRET))
    y = f(tab, idx)
    ok = np.array_equal(np.asarray(y),
                        np.asarray(tab)[np.asarray(idx)])
    dt = timeit(f, tab, idx)
    return (f"correct={ok} {nidx / dt / 1e9:.2f} Gelem/s "
            f"({dt / nidx * 1e9:.2f} ns/elem)")


# ------------------------------------------------- D: packed-frontier bit-test
def _bittest_kernel(tab_ref, idx_ref, o_ref):
    c = idx_ref[:]
    w = jnp.take(tab_ref[:], jnp.right_shift(c, 5), axis=0)
    bit = jnp.bitwise_and(
        jnp.right_shift(w, jnp.bitwise_and(c, 31)), 1)
    # reduce 512 edges/sublane -> 128 lanes (keeps the out tile legal)
    o_ref[:] = jnp.sum(bit.reshape(8, 4, 128), axis=1)


def probe_bittest(n_nodes=1 << 24, nidx=1 << 22, seed=1):
    rng = np.random.default_rng(seed)
    words = n_nodes // 32
    tab = jnp.asarray(rng.integers(0, 1 << 30, words, dtype=np.int32))
    idx = jnp.asarray(
        rng.integers(0, n_nodes, nidx, dtype=np.int32).reshape(-1, 512))
    grid = idx.shape[0] // 8

    f = jax.jit(pl.pallas_call(
        _bittest_kernel,
        out_shape=jax.ShapeDtypeStruct((idx.shape[0], 128), jnp.int32),
        grid=(grid,),
        in_specs=[pl.BlockSpec((words,), lambda i: (0,),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, 512), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=INTERPRET))
    y = f(tab, idx)
    tb = np.asarray(tab)
    ix = np.asarray(idx)
    bits = (tb[ix >> 5] >> (ix & 31)) & 1
    oracle = bits.reshape(-1, 4, 128).sum(axis=1)
    ok = np.array_equal(np.asarray(y), oracle)
    dt = timeit(f, tab, idx)
    return (f"correct={ok} {nidx / dt / 1e9:.2f} Gedge/s "
            f"({dt / nidx * 1e9:.2f} ns/edge)")


def main():
    print(f"device: {jax.devices()[0]} interpret={INTERPRET}", flush=True)
    probe("A_sanity", probe_sanity)
    probe("B_stream", partial(probe_stream, 64 if INTERPRET else 512))
    probe("C_take", partial(probe_take,
                            nidx=1 << (16 if INTERPRET else 22)))
    probe("D_bittest", partial(probe_bittest,
                               n_nodes=1 << 20,
                               nidx=1 << (16 if INTERPRET else 22)))
    probe("E_gather2d", partial(probe_gather2d,
                                nidx=1 << (14 if INTERPRET else 22)))
    if not INTERPRET:
        # scale-24-sized table (2 MB)
        probe("D_bittest_24", partial(probe_bittest, n_nodes=1 << 24,
                                      nidx=1 << 22))
        probe("E_gather2d_r32", partial(probe_gather2d, reps=32))




# ---------------------------------------------- E: 2D sublane-dim gather
# Mosaic rejects 1D gather with "Only 2D gather is supported"; the 2D form
# out[i,j] = tab[idx[i,j], j] (take_along_axis axis=0) is the lane-resident
# gather.  With neighbors placed at width slots whose LANE == (c>>5) % 128
# at build time, tab[(c>>5)>>7, (c>>5)%128] reads the full bit-packed
# frontier (2 MB VMEM at scale 24) from any lane: the BFS pull step becomes
# a streamed dense kernel.  This probes correctness + throughput.
def _gather2d_kernel(reps, tab_ref, idx_ref, o_ref):
    # idx block (8, 512): sublane indices into tab; lane is implicit.
    acc = jnp.zeros((8, 512), jnp.int32)
    R = tab_ref.shape[0]
    for k in range(reps):
        ix = jnp.bitwise_and(idx_ref[:] + k, R - 1)
        g = jnp.concatenate(
            [jnp.take_along_axis(tab_ref[:], ix[:, j * 128:(j + 1) * 128],
                                 axis=0) for j in range(4)], axis=1)
        acc = jnp.bitwise_or(acc, g)
    o_ref[:] = acc


def probe_gather2d(rows=4096, nidx=1 << 22, reps=8, seed=2):
    rng = np.random.default_rng(seed)
    tab = jnp.asarray(rng.integers(0, 1 << 30, (rows, 128), dtype=np.int32))
    idx = jnp.asarray(
        rng.integers(0, rows, nidx, dtype=np.int32).reshape(-1, 512))
    grid = idx.shape[0] // 8

    f = jax.jit(pl.pallas_call(
        partial(_gather2d_kernel, reps),
        out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.int32),
        grid=(grid,),
        in_specs=[pl.BlockSpec((rows, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, 512), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 512), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=INTERPRET))
    y = f(tab, idx)
    tb, ix = np.asarray(tab), np.asarray(idx)
    lane = np.arange(512) % 128
    acc = np.zeros_like(ix)
    for k in range(reps):
        acc |= tb[(ix + k) & (rows - 1), lane[None, :]]
    ok = np.array_equal(np.asarray(y), acc)
    dt = timeit(f, tab, idx)
    tot = nidx * reps
    return (f"correct={ok} {tot / dt / 1e9:.2f} Gelem/s "
            f"({dt / tot * 1e9:.3f} ns/elem, reps={reps})")


if __name__ == "__main__":
    sys.exit(main())
