"""Test configuration: run the suite on CPU with 8 virtual devices.

Mirrors the reference's test strategy of running everything both on 0 workers
and on 2 local worker processes (``test/runtests.jl:8-22``): a virtual
8-device CPU mesh exercises the same sharding/collective code paths as a real
multi-chip TPU slice.

Note: the harness pins JAX_PLATFORMS=axon via sitecustomize, so env vars are
not enough -- we must override through jax.config before any backend is used.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
