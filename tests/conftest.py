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
    flags += " --xla_force_host_platform_device_count=8"
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # 8 device threads timeshare ONE physical core here, so legitimate
    # skew between collective participants can exceed XLA:CPU's default
    # 40 s rendezvous kill (observed: MULTICHIP_r02 rc-134 abort). These
    # are liveness timeouts, not correctness gates — raise them far past
    # any real execution skew.
    flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=1200"
              " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600")
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402  (already imported by sitecustomize; config still settable)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# NO persistent compilation cache for the CPU suite. Empirically on this
# host, XLA:CPU's serialized AOT executables are not reliably reloadable for
# the largest programs (the full-model mesh-parity step): a cleanly-written
# cache entry from a PASSING run aborts the interpreter on reload ("Fatal
# Python error: Aborted" inside the fetch; cpu_aot_loader machine-feature
# E-logs accompany it). Fresh compiles always pass, so the suite trades
# repeat-run speed for determinism. TPU-side caching (bench.py, profiler,
# __graft_entry__) is unaffected — those reloads have been reliable.

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got " + str(jax.devices()))
assert jax.device_count() == 8, (
    f"expected 8 virtual CPU devices, got {jax.device_count()} — XLA_FLAGS was "
    "probably consumed before conftest ran")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _release_executables_between_modules():
    """Drop jit caches after each test file. A single pytest process that has
    accumulated the whole suite's compiled executables (~12 GB RSS, ~100
    programs) can hard-abort ("Fatal Python error: Aborted" inside
    pxla compile) when it then compiles the largest full-model mesh program —
    observed on this host class in the round-5 full run; the same test passes
    in a fresh process. Releasing executables between modules keeps within-
    file compile reuse (where almost all reuse is) while preventing the
    accumulation. Costs nothing measurable: cross-file jit cache hits are
    rare because each file builds its own configs."""
    yield
    jax.clear_caches()
