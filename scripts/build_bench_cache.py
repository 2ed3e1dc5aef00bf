"""Pre-build RMAT bench caches (pure numpy; step-resumable)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import bench

scale = int(sys.argv[1]) if len(sys.argv) > 1 else 24
cd = os.path.join(os.path.dirname(os.path.abspath(bench.__file__)), ".bench_cache")
t0 = time.time(); src, dst, n = bench.load_rmat(scale, cd)
print(f"rmat{scale} gen/load {time.time()-t0:.1f}s", flush=True)
t0 = time.time(); bench.sorted_transpose(src, dst, n, scale, cd)
print(f"transpose {time.time()-t0:.1f}s", flush=True)
t0 = time.time(); bench.forward_sorted(src, dst, n, scale, cd)
print(f"forward {time.time()-t0:.1f}s", flush=True)
print("DONE_CACHE", flush=True)
