"""Coverage-guided fuzzer smoke run (reference: fuzz/fuzz_targets/
fuzz_target_runtime.rs).  A short deterministic session must produce ZERO
engine escapes (internal errors on arbitrary input) and must demonstrate
coverage feedback (corpus grows past the seeds)."""

from falkordb_tpu.utils.fuzz import _SEEDS, run_fuzz


def test_fuzz_no_escapes_and_coverage_grows():
    findings, corpus, lines = run_fuzz(iterations=250, seed=1)
    assert not findings, [(q, repr(e)) for q, e in findings[:5]]
    assert corpus > len(_SEEDS)  # feedback loop found new coverage
    assert lines > 1500
