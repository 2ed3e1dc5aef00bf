"""Probe round 2: find the exact 2D gather form Mosaic accepts.

Variants of out = take_along_axis(src, idx, axis) inside a Pallas TPU
kernel; prints OK/FAIL + first traceback line per variant.
"""

import os
import sys
import time
import traceback
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


def variant(name, src_shape, idx_rows, axis, dtype=jnp.int32, reps=1):
    try:
        rng = np.random.default_rng(0)
        src = jnp.asarray(rng.integers(0, 100, src_shape, dtype=np.int32)
                          .astype(dtype))
        lim = src_shape[axis]
        idx_shape = (idx_rows, src_shape[1]) if axis == 0 \
            else (src_shape[0], idx_rows)
        idx = jnp.asarray(rng.integers(0, lim, idx_shape, dtype=np.int32))

        def kern(s_ref, i_ref, o_ref):
            acc = jnp.take_along_axis(s_ref[:], i_ref[:], axis=axis)
            for k in range(1, reps):
                ix = jnp.bitwise_and(i_ref[:] + k, lim - 1)
                acc = jnp.bitwise_or(
                    acc, jnp.take_along_axis(s_ref[:], ix, axis=axis))
            o_ref[:] = acc

        f = jax.jit(pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(idx_shape, dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=INTERPRET))
        y = np.asarray(f(src, idx))
        s, ix = np.asarray(src), np.asarray(idx)
        if reps == 1:
            oracle = np.take_along_axis(s, ix, axis=axis)
            ok = np.array_equal(y, oracle)
        else:
            ok = "n/a"
        # timing
        float(jnp.sum(f(src, idx).astype(jnp.float32)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(f(src, idx).astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        nel = int(np.prod(idx_shape)) * reps
        print(f"VAR {name}: OK correct={ok} {nel/best/1e9:.3f} Gelem/s "
              f"({best*1e3:.1f} ms total)", flush=True)
    except Exception as e:  # noqa: BLE001
        tb = traceback.format_exc().strip().split("\n")
        src_line = next((ln for ln in reversed(tb) if "mosaic" in ln.lower()
                         or "pallas" in ln.lower()), "")
        print(f"VAR {name}: FAIL {type(e).__name__}: "
              f"{str(e).splitlines()[0][:200]} | {src_line.strip()[:160]}",
              flush=True)


def main():
    print(f"device: {jax.devices()[0]} interpret={INTERPRET}", flush=True)
    variant("sameshape_8x128_ax0", (8, 128), 8, 0)
    variant("sameshape_512x128_ax0", (512, 128), 512, 0)
    variant("sameshape_4096x128_ax0", (4096, 128), 4096, 0)
    variant("tall_idx8_tab512_ax0", (512, 128), 8, 0)
    variant("tall_idx512_tab4096_ax0", (4096, 128), 512, 0)
    variant("ax1_8x128", (8, 128), 128, 1)
    variant("ax1_8x2048", (8, 2048), 2048, 1)
    # throughput: big same-shape with in-kernel reps
    variant("perf_4096x128_r16", (4096, 128), 4096, 0, reps=16)
    variant("perf_4096x128_r64", (4096, 128), 4096, 0, reps=64)


if __name__ == "__main__":
    sys.exit(main())
