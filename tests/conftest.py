"""Test harness: force CPU with 8 virtual devices (the TPU analogue of a
fake distributed backend — SURVEY.md §4) before JAX initializes."""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The hosted TPU plugin ignores JAX_PLATFORMS from the environment; the
# config API is authoritative.  Must run before any backend is touched.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: repeated test runs skip recompilation
from rvos_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
