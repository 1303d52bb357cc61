"""Test configuration: run on an 8-device virtual CPU mesh.

Mirrors the TPU multi-chip topology without hardware, per the project test
strategy (SURVEY.md §4).

Environment gotcha: this machine's sitecustomize imports jax at interpreter
start with JAX_PLATFORMS=axon (the TPU tunnel), so setting the env var here is
too late — we must go through jax.config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (already imported by sitecustomize; config still settable)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the train-step tests compile multi-minute XLA
# programs; caching makes repeat suite runs fast.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got " + str(jax.devices()))
assert jax.device_count() == 8, (
    f"expected 8 virtual CPU devices, got {jax.device_count()} — XLA_FLAGS was "
    "probably consumed before conftest ran")
