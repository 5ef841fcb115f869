import os

# Tests run on a virtual 8-device CPU mesh with float64 available, mirroring
# the reference's CPU-first, float64-deterministic test policy
# (/root/reference/nequip/utils/unittests/conftest.py:57-72).  Multi-chip
# sharding is exercised on the virtual mesh; real-TPU behavior is covered by
# bench.py and __graft_entry__.py.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# NOTE: the axon TPU plugin overrides the JAX_PLATFORMS env var, so the
# platform must be forced through the config API before backend init.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compilation cache makes repeated CPU test runs much faster
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
