"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-chip sharding tests use a virtual 8-device mesh (the driver validates
the real multi-chip path separately via __graft_entry__.dryrun_multichip).
Must set the env vars before jax initializes its backends.
"""
import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# In this image a sitecustomize registers an 'axon' TPU backend and sets
# JAX_PLATFORMS=axon before any user code runs, so the env var cannot be
# overridden from here — force the platform through the config instead.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # fp64 available for oracle tests

# persistent XLA cache (enabled by the package import below): repeat suite
# runs skip recompiling unchanged programs. The suite's throwaway x64-CPU
# executables go to their own directory so they never crowd the production
# cache (respect an explicit user override).
os.environ.setdefault(
    "LIE_VAE_TPU_CACHE_DIR",
    os.path.expanduser("~/.cache/lie_vae_tpu/xla-tests"))
import lie_vae_tpu  # noqa: E402,F401

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
