"""Probe: frontier row-gather cost at the scale-24 bench config (TPU).

Measures the one op that dominates the gated BFS level step —
  acc = OR_j take(frontier, colsT[j], axis=0)
at n=2^24, W=128 int8 (1024 lanes), w=16 columns — plus dtype-view and
row-width variants, to locate the ns/row wall the Pallas kernel must beat.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = (1 << 24) + 1
ROWS = 1 << 21  # 2M gathered rows per column slice


def timeit(tag, fn, *args, reps=3):
    out = fn(*args)
    out.block_until_ready()
    float(jnp.sum(out[0].astype(jnp.float32)))  # force through relay
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        out.block_until_ready()
        float(jnp.sum(out[0].astype(jnp.float32)))
        best = min(best, time.time() - t0)
    print(f"{tag}: {best*1000:.1f} ms", flush=True)
    return best


def main():
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}", flush=True)

    f8 = jnp.asarray(rng.integers(0, 256, (N, 128), dtype=np.uint8)
                     .view(np.int8))
    cols16 = jnp.asarray(rng.integers(0, N - 1, (16, ROWS), dtype=np.int32))
    f8.block_until_ready()

    @jax.jit
    def gather_or16_i8(f, c):
        acc = jnp.take(f, c[0], axis=0, mode="clip")
        for j in range(1, 16):
            acc = jnp.bitwise_or(acc, jnp.take(f, c[j], axis=0, mode="clip"))
        return acc

    t = timeit("or16 int8x128 (32M rows, 4.3GB)", gather_or16_i8, f8, cols16)
    print(f"  -> {t/ (16*ROWS) * 1e9:.2f} ns/row, "
          f"{16*ROWS*128/t/1e9:.1f} GB/s", flush=True)

    # single take (no OR chain) — is the OR chain serializing?
    @jax.jit
    def take1_i8(f, c):
        return jnp.take(f, c[0], axis=0, mode="clip")

    t = timeit("take1 int8x128 (2M rows)", take1_i8, f8, cols16)
    print(f"  -> {t/ROWS*1e9:.2f} ns/row, {ROWS*128/t/1e9:.1f} GB/s",
          flush=True)

    # int32 view: same bytes/row, 32 elements — element-count effect
    f32v = jax.lax.bitcast_convert_type(
        f8.reshape(N, 32, 4), jnp.int32)  # (N, 32) int32

    @jax.jit
    def take1_i32(f, c):
        return jnp.take(f, c[0], axis=0, mode="clip")

    t = timeit("take1 int32x32 view (2M rows)", take1_i32, f32v, cols16)
    print(f"  -> {t/ROWS*1e9:.2f} ns/row, {ROWS*128/t/1e9:.1f} GB/s",
          flush=True)

    # f32 dtype same shape
    ff = f8.astype(jnp.float32)  # (N,128) f32 = 8.6 GB... too big? 8.6GB ok

    @jax.jit
    def take1_f32(f, c):
        return jnp.take(f, c[0], axis=0, mode="clip")

    t = timeit("take1 f32x128 (2M rows, 512B/row)", take1_f32, ff, cols16)
    print(f"  -> {t/ROWS*1e9:.2f} ns/row, {ROWS*512/t/1e9:.1f} GB/s",
          flush=True)
    del ff

    # sorted indices: does locality help?
    cols_sorted = jnp.asarray(np.sort(np.asarray(cols16[0])))[None, :]

    @jax.jit
    def take1_sorted(f, c):
        return jnp.take(f, c[0], axis=0, mode="clip")

    t = timeit("take1 int8x128 SORTED idx", take1_sorted, f8, cols_sorted)
    print(f"  -> {t/ROWS*1e9:.2f} ns/row, {ROWS*128/t/1e9:.1f} GB/s",
          flush=True)

    # hot working set: indices within the top 64K rows (VMEM-size region)
    cols_hot = jnp.asarray(rng.integers(0, 1 << 16, (1, ROWS),
                                        dtype=np.int32))
    t = timeit("take1 int8x128 HOT64K idx", take1_sorted, f8, cols_hot)
    print(f"  -> {t/ROWS*1e9:.2f} ns/row, {ROWS*128/t/1e9:.1f} GB/s",
          flush=True)

    # streaming epilogue cost at full state size: 3 arrays of (N,128)
    @jax.jit
    def epilogue(reach, visited):
        fresh = jnp.bitwise_and(reach, jnp.bitwise_not(visited))
        return jnp.bitwise_or(visited, fresh), fresh

    r8 = jnp.asarray(rng.integers(0, 256, (N, 128), dtype=np.uint8)
                     .view(np.int8))
    t = timeit("epilogue stream (2x2.1GB in, 2x out)", epilogue, r8, f8)
    print(f"  -> {4*N*128/t/1e9:.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
