"""Subprocess driver for the 2-process multi-host tests (run by
tests/test_multihost.py — not collected by pytest).

Each process owns its own block of virtual CPU devices; `jax.distributed.
initialize` joins them into one mesh with cross-process gloo collectives —
the CPU stand-in for a 2-host TPU pod (SURVEY §2.5 "comm backend").

Modes:
  base — one base-UDA train step (4 devices/host) with per-host sharded
         loading (`DataLoader(process_index=...)`) through `shard_batch`'s
         `make_array_from_process_local_data` branch
         (`parallel/mesh.py:69-78`, `data/loader.py:54-81`).
  full — EVERY loss branch (graph matching + discriminators + temporal graph
         + cycle loss, 2 devices/host): the separate source/target clip keys
         concatenated inside the jit and the per-host whole-clip cyc frames
         must compose into the exact single-process global layout.

Process 0 writes the loss dict to a JSON file.

Usage: python _multihost_driver.py <rank> <nproc> <port> <out.json> [mode]
"""

import json
import os
import sys

rank, nproc, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                               sys.argv[3], sys.argv[4])
mode = sys.argv[5] if len(sys.argv) > 5 else "base"

import _multihost_common as C  # noqa: E402

devices_per_host = 4 if mode == "base" else C.FULL_DEVICES_PER_HOST
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    flags + f" --xla_force_host_platform_device_count={devices_per_host}"
    " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
    # correctness check, not a benchmark: O1 halves XLA:CPU compile time of
    # the big fused step (same rationale as __graft_entry__.dryrun_multichip)
    " --xla_backend_optimization_level=1").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=rank)

import jax.numpy as jnp  # noqa: E402

from graphecho_tpu.parallel.mesh import create_mesh, replicate, shard_batch  # noqa: E402
from graphecho_tpu.train.state import Optimizers, create_train_state  # noqa: E402
from graphecho_tpu.train.steps import build_models, make_train_step  # noqa: E402

assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == devices_per_host * nproc, jax.device_count()

if mode == "base":
    cfg = C.make_cfg()
    batch = C.build_batch(process_index=rank, process_count=nproc)
else:
    cfg = C.make_full_cfg()
    batch = C.build_full_batch(process_index=rank, process_count=nproc)

models = build_models(cfg)
optimizers = Optimizers(cfg)
state = create_train_state(cfg, models, optimizers, jax.random.PRNGKey(0),
                           {k: jnp.asarray(v) for k, v in batch.items()})
mesh = create_mesh()
state = replicate(mesh, state)
sharded = shard_batch(mesh, batch)  # the multi-host branch under test

import time  # noqa: E402

step = jax.jit(make_train_step(cfg, models, optimizers))
with mesh:
    # AOT-compile FIRST, then rendezvous on a coordination-service barrier
    # (plain RPC — no gloo) before executing. XLA:CPU compiles of this fused
    # step take >10 min on a starved 1-core host and the two ranks' compile
    # times can skew by MINUTES; without the barrier the faster rank's gloo
    # TCP connect for the first collective times out waiting for the peer
    # still stuck in compilation.
    t0 = time.time()
    compiled = step.lower(state, sharded).compile()
    t1 = time.time()
    print(f"[rank {rank}] compile {t1 - t0:.0f}s", flush=True)
    from jax._src import distributed  # noqa: E402

    distributed.global_state.client.wait_at_barrier(
        "compile_done", timeout_in_ms=3600 * 1000)
    # barrier-aligned warm-up all-reduce: creates the cross-process gloo
    # communicator while the ranks are still in lockstep, so the big
    # program's first collective reuses it instead of doing a lazy TCP
    # connect that times out if the peer rank is scheduled unfairly
    import numpy as np  # noqa: E402
    from jax.sharding import NamedSharding, PartitionSpec  # noqa: E402

    warm = jax.make_array_from_process_local_data(
        NamedSharding(mesh, PartitionSpec("data")),
        np.ones((devices_per_host,), "float32"))
    assert float(jax.jit(lambda v: v.sum())(warm)) == nproc * devices_per_host
    _, metrics = compiled(state, sharded)
    metrics = {k: float(v) for k, v in metrics.items()}
    print(f"[rank {rank}] execute {time.time() - t1:.0f}s", flush=True)
    distributed.global_state.client.wait_at_barrier(
        "step_done", timeout_in_ms=3600 * 1000)
if rank == 0:
    with open(out_path, "w") as f:
        json.dump(metrics, f)
jax.distributed.shutdown()
