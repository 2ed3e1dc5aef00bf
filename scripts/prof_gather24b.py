"""Probe round 2: OR-chain overlap depth, int16 row cost, 2048-lane HBM
capacity, and relay dispatch pipelining (TPU)."""
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
TOT = 1 << 25  # 32M gathered rows per experiment


def timeit(tag, fn, *args, reps=3, per=None, bw=None):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out[0].astype(jnp.float32)))
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        float(jnp.sum(out[0].astype(jnp.float32)))
        best = min(best, time.time() - t0)
    extra = ""
    if per:
        extra = f" -> {best/per*1e9:.2f} ns/row"
    if bw:
        extra += f", {bw/best/1e9:.1f} GB/s"
    print(f"{tag}: {best*1000:.1f} ms{extra}", flush=True)
    return best


def make_or(w):
    @jax.jit
    def f(fr, c):
        acc = jnp.take(fr, c[0], axis=0, mode="clip")
        for j in range(1, w):
            acc = jnp.bitwise_or(acc,
                                 jnp.take(fr, c[j], axis=0, mode="clip"))
        return acc
    return f


def main():
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}", flush=True)

    # --- dispatch pipelining: 24 dependent tiny jits then one sync ---
    @jax.jit
    def bump(x):
        return x + 1

    x = jnp.zeros((8, 128), jnp.float32)
    x = bump(x); x.block_until_ready()
    t0 = time.time()
    for _ in range(24):
        x = bump(x)
    x.block_until_ready()
    float(x.sum())
    print(f"24 chained tiny dispatches: {(time.time()-t0)*1000:.0f} ms "
          f"({(time.time()-t0)/24*1000:.1f} ms/dispatch)", flush=True)

    # --- int16 x 128 words (2048 lanes, 256B rows): flat-cost check ---
    f16 = jnp.asarray(rng.integers(0, 1 << 15, (N, 128), dtype=np.int16))
    f16.block_until_ready()
    for w in (8, 16, 32):
        cols = jnp.asarray(
            rng.integers(0, N - 1, (w, TOT // w), dtype=np.int32))
        timeit(f"or{w} int16x128 (32M rows)", make_or(w), f16, cols,
               per=TOT, bw=TOT * 256)
    del f16

    # --- capacity: three (N,128) int16 arrays + 400M int32 edges ---
    try:
        a = jnp.zeros((N, 128), jnp.int16)
        b = jnp.zeros((N, 128), jnp.int16)
        c = jnp.zeros((N, 128), jnp.int16)
        e = jnp.zeros((386 << 20,), jnp.int32)
        jax.block_until_ready((a, b, c, e))
        print("capacity 3x(N,128)i16 + 386M i32 edges: OK (14.4 GB)",
              flush=True)
        del a, b, c, e
    except Exception as ex:
        print(f"capacity 2048-lane: OOM — {str(ex)[:160]}", flush=True)


if __name__ == "__main__":
    main()
