"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding tests run without TPU hardware (SURVEY.md §2c TPU-native mapping)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Persistent compilation cache: first-time per-op XLA compiles are ~1s on
# this host; caching makes repeat test runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.3")

# The environment's 'axon' TPU plugin ignores the JAX_PLATFORMS env var, so
# force the CPU backend through the config API as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def ref_scenes():
    return os.path.join(REFERENCE, "scenes")


@pytest.fixture(scope="session")
def ref_us_scenes():
    return os.path.join(REFERENCE, "MitsubaScenes")
