"""Test config: run everything on CPU jax with an 8-device virtual mesh.

SURVEY.md §7 'hard parts' #5: no local TPU — the suite must run on CPU jax
(Pallas kernels in interpret mode) with sharding tested on a virtual
8-device CPU mesh (--xla_force_host_platform_device_count).
"""

import os

# must be set before jax initializes its backends
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon TPU plugin registers itself via sitecustomize and ignores
# JAX_PLATFORMS; force the CPU backend explicitly.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
