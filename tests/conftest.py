"""Test configuration: force the JAX CPU backend with a virtual 8-device mesh
so multi-chip sharding logic is exercised without TPU hardware (SURVEY.md §4).

Note: this image pre-imports jax in sitecustomize with JAX_PLATFORMS=axon, so
env vars are too late here — we must update jax.config before any backend is
instantiated. Tests must never touch the (single, exclusive-access) TPU chip.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# tests are correctness checks: skip XLA's expensive optimization passes
# (cuts CPU compile time ~35%, the dominant cost of this suite)
if "xla_backend_optimization_level" not in flags:
    flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _reset_compute_dtype():
    """Trainer(compute_dtype=...) sets a process-wide trace-time policy
    (nn/common.py); reset it after every test so a bf16 training test can't
    leak reduced precision into later f32 parity assertions."""
    yield
    from caster_dta_tpu.nn import common as nn_common
    nn_common.set_compute_dtype(None)
