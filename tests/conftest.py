"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment's sitecustomize registers the TPU backend and forces
``jax_platforms`` via jax config (so the JAX_PLATFORMS env var alone is not
enough); we override the config back to CPU here, before any backend is
initialized.  XLA_FLAGS must be set before backend init, hence at conftest
import time.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
