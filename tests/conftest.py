"""Test env: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU plugin and pins
JAX_PLATFORMS=axon before conftest runs, so we override the platform via
jax.config (effective because backends initialise lazily) — this keeps the
suite off the TPU tunnel and makes startup ~2s instead of ~60s.
"""

import os

# must be set before the first backend initialisation
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
