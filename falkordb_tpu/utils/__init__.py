"""Auxiliary tooling: coverage-guided fuzzing (utils.fuzz)."""
