"""Device mesh + sharding for data-parallel training over ICI.

The reference's distributed stack — NCCL process groups, DDP wrappers with
`find_unused_parameters`, SyncBatchNorm conversion, DistributedSampler
(`train_camus_echo.py:129-160,526-535`) — collapses on TPU to:

  * one `jax.sharding.Mesh` over the slice (axis "data");
  * batches sharded on their leading dim (`NamedSharding(P("data", ...))`);
  * state replicated;
  * ONE jitted step — XLA/GSPMD inserts the gradient all-reduces over ICI,
    and BatchNorm's batch-dim reductions become global (SyncBN) for free.

Multi-host: `initialize_distributed` wraps `jax.distributed.initialize`, the
TPU-native replacement for the reference's PMI/OMPI env discovery
(`utils/tools.py:5-47`).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host init. No-ops on a single process (the common case here,
    mirroring the reference's world_size=1 default)."""
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def create_mesh(data: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh (the model is ~40M params — TP/PP are out of
    scope per SURVEY §2.5; the mesh axis name leaves room to add them)."""
    devices = devices if devices is not None else jax.devices()
    n = data or len(devices)
    return Mesh(np.asarray(devices[:n]).reshape(n), axis_names=("data",))


def shard_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Device-put a host batch sharded on the leading axis. Entries whose
    leading dim does not divide the mesh (e.g. the (B/2,) `update_idx_*`
    queue columns when B/2 < devices) are replicated — GSPMD still runs the
    dependent compute data-parallel where it can.

    Multi-host: each process passes its LOCAL shard (per-host sharded
    loading, `DataLoader(process_index=..., process_count=...)`) and the
    global array is assembled with `make_array_from_process_local_data` —
    the global leading dim is local_dim * process_count. Entries that cannot
    shard are REJECTED rather than 'replicated' from differing per-host data
    (each host would silently hold different values for the same logical
    array). Every train-step entry is designed to compose: clip halves
    travel as separate source/target keys (concatenated inside the jit) and
    cyc frames are whole-clips-per-host (vmapped per clip) — see the
    `train/steps.py` batch contract; `real_training._check_multihost`
    pre-validates the (TEMPORAL_BATCH,) entries' divisibility."""
    n = mesh.shape["data"]
    multihost = jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        if multihost:
            global_lead = v.shape[0] * jax.process_count() if v.ndim >= 1 else 0
            if not (v.ndim >= 1 and global_lead % n == 0):
                raise ValueError(
                    f"shard_batch: entry {k!r} (local shape {v.shape}) cannot "
                    f"be sharded over {n} devices from "
                    f"{jax.process_count()} hosts; replicating per-host data "
                    "would give hosts inconsistent values")
            out[k] = jax.make_array_from_process_local_data(
                NamedSharding(mesh, P("data")), np.asarray(v))
        else:
            spec = P("data") if v.ndim >= 1 and v.shape[0] % n == 0 else P()
            out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def all_gather_nodes(x, axis_name: str = "data"):
    """Explicit all-gather of per-shard node features, for use inside
    shard_map'd code that needs globally-visible nodes (the TPU analogue of
    the reference's dead `concat_all_gather`, `TGCN.py:315-326`; under plain
    GSPMD jit this is unnecessary — global semantics are automatic)."""
    return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)
