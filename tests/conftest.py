"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-native answer to "test multi-node without a cluster" (SURVEY.md §4):
the XLA host backend exposes N fake devices, so sharding/collective code paths compile
and execute exactly as they would on a TPU slice.

Note: this environment's sitecustomize registers a remote "axon" TPU backend and
forces ``jax_platforms="axon,cpu"`` from interpreter start; the config update below
overrides it back to cpu so tests never remote-compile through the TPU tunnel.
"""

import os
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_prng_impl", "threefry2x32")

# persistent compilation cache: repeated test runs skip XLA compiles entirely
_CACHE = Path(__file__).resolve().parents[1] / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running parity tests, gated behind STEDM_RUN_SLOW=1")
