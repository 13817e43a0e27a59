"""Test configuration: force CPU backend with a virtual 8-device mesh.

Tests always run on CPU (fast, deterministic, CI-friendly); multi-chip sharding
paths are exercised on 8 virtual host devices per the build contract. Real-TPU
execution is covered by bench.py / __graft_entry__.py which the driver runs.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) can pin the platform regardless of the
# env var; config.update wins.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the model-level tests re-compile identical
# graphs on every pytest run (minutes each on this 1-core host); the cache
# makes reruns load in seconds. Shared with __graft_entry__.dryrun_multichip.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
