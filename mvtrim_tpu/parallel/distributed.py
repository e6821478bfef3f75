"""Multi-host (pod / multi-process) initialization.

The reference has no cross-machine story at all (SURVEY.md §5: no
NCCL/MPI/RPC); here the distributed substrate is JAX's: each host process
joins a coordination service and ``jax.devices()`` then spans the pod, so
``parallel.mesh.build_mesh()`` / ``sharded_scan_step`` transparently shard
frame batches across hosts with ICI/DCN collectives.

IMPORTANT: call ``initialize()`` before any other JAX usage —
``jax.distributed.initialize`` must run before backends initialize, so
this function decides from environment variables alone and never queries
jax state beforehand.

On Cloud TPU pods, ``jax.distributed.initialize()`` discovers everything
from the metadata server; elsewhere pass coordinator/process info
explicitly or via the standard JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES
/ JAX_PROCESS_ID env vars.
"""

from __future__ import annotations

import os

from ..utils import logging as log

_initialized = False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Join the multi-host coordination service (idempotent).

    Returns True when running multi-process after the call, False for
    single-process operation (the default everywhere except pods).
    Must be called before any JAX computation/backend use.
    """
    global _initialized
    # an empty env var (unfilled compose/env template) means UNSET — it
    # must not trigger a coordinator-less multi-process initialize()
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS")
                           or None)
    explicit = coordinator_address is not None
    on_tpu_pod = bool(os.environ.get("TPU_WORKER_HOSTNAMES"))

    if not (explicit or on_tpu_pod):
        return False

    import jax

    if _initialized:
        return jax.process_count() > 1

    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes or os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(
            num_processes or os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(
            process_id if process_id is not None
            else os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    _initialized = True
    log.info(f"distributed: process {jax.process_index()} of "
             f"{jax.process_count()}, {jax.device_count()} devices total")
    return jax.process_count() > 1
