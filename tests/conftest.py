"""Test configuration: run on an 8-device virtual CPU mesh.

Mirrors the TPU multi-chip topology without hardware, per the project test
strategy (SURVEY.md §4): XLA_FLAGS host-platform device count + JAX_PLATFORMS
must be set before jax initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
