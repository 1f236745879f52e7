"""Test config: force the CPU backend with an 8-device virtual mesh.

The environment pre-imports jax (axon sitecustomize) and pins
JAX_PLATFORMS=axon, so env vars are too late here — use config updates,
which take effect because backends initialize lazily.  Multi-chip
sharding tests then run on 8 virtual CPU devices (the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip).
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
