"""Graph algorithms (the LAGraph replacement) — jitted JAX programs over
the L1' sparse kernels.  Reference inventory: algo_procedures.rs:40-52."""
