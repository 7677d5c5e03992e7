"""Test harness: force an 8-virtual-device CPU platform before JAX import.

This is the standard JAX trick for exercising multi-device meshes without
TPU hardware; it substitutes for multi-node simulation (the reference has
no tests at all — SURVEY.md §4)."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The baked axon sitecustomize force-selects the TPU backend at interpreter
# startup, overriding JAX_PLATFORMS from the environment — override it back
# before any backend is initialised.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)


@pytest.fixture(scope="session")
def n_devices():
    return jax.device_count()


@pytest.fixture(scope="session")
def mesh8():
    from ecgmm_tpu.parallel import make_mesh

    return make_mesh()


@pytest.fixture()
def rng():
    return np.random.default_rng(42)
