"""Test harness: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated without TPU hardware the standard JAX
way: XLA_FLAGS=--xla_force_host_platform_device_count=8 (SURVEY.md §4).
Env vars must be set before jax is imported by any test module.
"""

import os

# The image pins JAX_PLATFORMS=axon (remote TPU tunnel); tests must run on
# local CPU devices, so force-override rather than setdefault. The axon
# remote-Pallas hooks must be disabled too or interpret-mode kernels
# mis-execute.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# sitecustomize (axon) imports jax at interpreter start, so env vars set
# here can be too late (they are read into jax.config at import time);
# force the platform/device-count through jax.config post-import. Without
# the explicit jax_platforms update the suite silently runs on the remote
# TPU (bf16 matmul precision), breaking tight-tolerance parity tests.
try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass
assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU platform, got "
    f"{jax.devices()[0].platform}")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
