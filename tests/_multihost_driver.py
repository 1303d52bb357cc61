"""Subprocess driver for the 2-process multi-host test (run by
tests/test_multihost.py — not collected by pytest).

Each process owns 4 virtual CPU devices; `jax.distributed.initialize` joins
them into one 8-device mesh with cross-process gloo collectives — the CPU
stand-in for a 2-host TPU pod (SURVEY §2.5 "comm backend"). Runs ONE base-UDA
train step with per-host sharded loading (`DataLoader(process_index=...)`)
through `shard_batch`'s `make_array_from_process_local_data` branch
(`parallel/mesh.py:69-78`) and writes the loss dict to a JSON file from
process 0.

Usage: python _multihost_driver.py <rank> <nproc> <port> <out.json>
"""

import json
import os
import sys

rank, nproc, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                               sys.argv[3], sys.argv[4])

flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=4"
    " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=rank)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))
from _multihost_common import build_batch, make_cfg  # noqa: E402

from graphecho_tpu.parallel.mesh import create_mesh, replicate, shard_batch  # noqa: E402
from graphecho_tpu.train.state import Optimizers, create_train_state  # noqa: E402
from graphecho_tpu.train.steps import build_models, make_train_step  # noqa: E402

assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 4 * nproc, jax.device_count()

cfg = make_cfg()
batch = build_batch(process_index=rank, process_count=nproc)

models = build_models(cfg)
optimizers = Optimizers(cfg)
state = create_train_state(cfg, models, optimizers, jax.random.PRNGKey(0),
                           {k: jnp.asarray(v) for k, v in batch.items()})
mesh = create_mesh()
state = replicate(mesh, state)
sharded = shard_batch(mesh, batch)  # the multi-host branch under test

step = jax.jit(make_train_step(cfg, models, optimizers))
with mesh:
    _, metrics = step(state, sharded)
metrics = {k: float(v) for k, v in metrics.items()}
if rank == 0:
    with open(out_path, "w") as f:
        json.dump(metrics, f)
jax.distributed.shutdown()
