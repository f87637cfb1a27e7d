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

# Harden against rare XLA-CPU compiler segfaults on the largest modules
# late in long sessions (observed twice at ~90% of the full suite, both
# in trace_spectral's compile; the same test passes standalone):
# (a) raise the stack limit before the compiler's worker threads spawn,
# (b) persistent compile cache so repeat runs skip the big compiles
#     entirely (also a large suite-time win).
import resource  # noqa: E402

try:
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))
except (ValueError, OSError):
    pass

# (c) XLA:CPU keeps a (rw-, r-x, r--) mmap triple per live compiled
# executable; the full suite accumulates ~60k mappings and segfaults
# mid-compile when it crosses the kernel default vm.max_map_count=65530
# (diagnosed by watching /proc/<pid>/maps grow to the limit right where
# the crashes happened). Raise it when running as root; ignore failures.
try:
    with open("/proc/sys/vm/max_map_count") as _f:
        if int(_f.read()) < 1_000_000:
            with open("/proc/sys/vm/max_map_count", "w") as _f:
                _f.write("4000000")
except (OSError, ValueError):
    pass
jax.config.update("jax_compilation_cache_dir", "/tmp/lpcl_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
