"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding logic is validated on a fake device mesh — the
TPU-native analog of testing multi-node code without a cluster
(SURVEY.md section 4e).  The container's sitecustomize imports jax and
registers the TPU plugin before pytest starts, so plain env mutation is too
late; we go through jax.config, which takes effect at first backend use.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
