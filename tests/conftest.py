"""Test harness config: hermetic 8-virtual-device CPU mesh.

Mirrors the reference's host-independent engine testing (the fuzz/flow
"fake backend" pattern, SURVEY.md §4): everything runs without TPU hardware;
sharding tests see 8 XLA host devices."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize force-sets jax_platforms="axon,cpu" from inside
# register(); the env var alone does not win.  Re-override after import so
# tests run on the virtual 8-device CPU mesh, not through the TPU relay.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
