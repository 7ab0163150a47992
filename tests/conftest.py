"""Test config: run on CPU with 8 virtual devices.

This is the JAX analogue of testing multi-node without a cluster (SURVEY §4):
the same code paths that shard over a real TPU pod run here over 8 host
devices. Must run before jax is imported anywhere.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The environment's sitecustomize force-registers a TPU backend at interpreter
# start, which wins over JAX_PLATFORMS — override through jax.config too.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
