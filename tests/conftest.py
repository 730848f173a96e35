"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding logic is validated on a fake device mesh — the
TPU-native analog of testing multi-node code without a cluster
(SURVEY.md section 4e).  The container's sitecustomize imports jax and
registers the TPU plugin before pytest starts, so plain env mutation is too
late; we go through jax.config, which takes effect at first backend use.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Persistent compilation cache: the suite's cost on this 1-core host is
# dominated by XLA recompiles; repeat runs hit the cache and drop to the
# actual numerics time.  (Env vars are ignored — sitecustomize has already
# imported jax — so go through jax.config, as above.)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".cache",
                               "jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
