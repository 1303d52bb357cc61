"""Cluster/rank environment discovery.

Re-implements the reference `utils/tools.py:5-47` (PMI / OMPI / Azure Batch
env probing for torch.distributed) in terms JAX distributed init understands.
On TPU pods the canonical path is `jax.distributed.initialize()` with
coordinator discovery; these helpers cover the same env conventions for
mpirun-style launches.
"""

from __future__ import annotations

import os


def get_world_size() -> int:
    if "PMI_SIZE" in os.environ:
        return int(os.environ["PMI_SIZE"])
    if "OMPI_COMM_WORLD_SIZE" in os.environ:
        return int(os.environ["OMPI_COMM_WORLD_SIZE"])
    if "JAX_NUM_PROCESSES" in os.environ:
        return int(os.environ["JAX_NUM_PROCESSES"])
    return 1


def get_global_rank() -> int:
    if "PMI_RANK" in os.environ:
        return int(os.environ["PMI_RANK"])
    if "OMPI_COMM_WORLD_RANK" in os.environ:
        return int(os.environ["OMPI_COMM_WORLD_RANK"])
    if "JAX_PROCESS_ID" in os.environ:
        return int(os.environ["JAX_PROCESS_ID"])
    return 0


def get_local_rank() -> int:
    if "MPI_LOCALRANKID" in os.environ:
        return int(os.environ["MPI_LOCALRANKID"])
    if "OMPI_COMM_WORLD_LOCAL_RANK" in os.environ:
        return int(os.environ["OMPI_COMM_WORLD_LOCAL_RANK"])
    return get_global_rank()


def get_master_ip() -> str:
    """Coordinator address: Azure Batch convention, then generic env, then
    loopback (the reference's default, `tools.py:41-47`)."""
    if "AZ_BATCH_MASTER_NODE" in os.environ:
        return os.environ["AZ_BATCH_MASTER_NODE"].split(":")[0]
    if "AZ_BATCHAI_MPI_MASTER_NODE" in os.environ:
        return os.environ["AZ_BATCHAI_MPI_MASTER_NODE"]
    if "JAX_COORDINATOR_ADDRESS" in os.environ:
        return os.environ["JAX_COORDINATOR_ADDRESS"].split(":")[0]
    return "127.0.0.1"
