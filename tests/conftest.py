"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py and the driver's compile checks;
the test suite validates numerics and multi-device sharding on host CPU so it
runs anywhere (and so sharding bugs surface without an 8-chip pod).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's sitecustomize may have imported jax already (pinning the
# axon TPU platform before this file runs); jax.config wins over the env var.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(7654)
