"""Pre-build ALL RMAT bench caches (pure numpy/host; step-resumable).

Covers every host-side product bench.py needs at the given scale, so a
bench process goes straight to device upload: raw edges, sorted-transpose
CSR, forward CSR, aux (roots/seeds/degrees), and the packed-ELL chunks
(the 568 s build that timed out BENCH_r02).  Never touches the TPU relay.
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")  # axon sitecustomize override
import bench

scale = int(sys.argv[1]) if len(sys.argv) > 1 else 24
chunk_edges = int(os.environ.get("BENCH_CHUNK_EDGES", str(32 << 20)))
cd = os.path.join(os.path.dirname(os.path.abspath(bench.__file__)), ".bench_cache")
t0 = time.time(); src, dst, n = bench.load_rmat(scale, cd)
print(f"rmat{scale} gen/load {time.time()-t0:.1f}s", flush=True)
t0 = time.time(); bench.sorted_transpose(src, dst, n, scale, cd)
print(f"transpose {time.time()-t0:.1f}s", flush=True)
t0 = time.time(); bench.forward_sorted(src, dst, n, scale, cd)
print(f"forward {time.time()-t0:.1f}s", flush=True)
t0 = time.time(); bench.prepare_aux(scale, cd)
print(f"aux {time.time()-t0:.1f}s", flush=True)
t0 = time.time(); bench.prepare_packed(scale, chunk_edges, cd)
print(f"packed {time.time()-t0:.1f}s", flush=True)
print("DONE_CACHE", flush=True)
