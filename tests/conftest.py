"""Test harness: run everything on the CPU fake backend with 8 virtual
devices — the JAX equivalent of a fake/multi-device test backend (SURVEY.md
§4).

Note: the axon TPU plugin (when present) overrides JAX_PLATFORMS via
jax.config at import time, so we must force the cpu platform through
jax.config too, before any backend initializes."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
