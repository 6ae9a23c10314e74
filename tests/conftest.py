"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-native answer to "test multi-node without a cluster" (SURVEY.md §4):
the XLA host backend exposes N fake devices, so sharding/collective code paths compile
and execute exactly as they would on a TPU slice.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_default_prng_impl", "threefry2x32")
