"""Multi-host (TPU pod) runtime initialization.

The reference relies on `accelerate launch` + NCCL env plumbing
(SURVEY.md 2.11); the TPU-native equivalent is one call to
`jax.distributed.initialize()` per host process before any backend use.
On a Cloud TPU pod slice the coordinator/process count are auto-detected;
explicit values can come from env or arguments.  Safe no-op on single host.
"""

from __future__ import annotations

import os
from typing import Optional

_INITIALIZED = False


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when a pod environment is detected.

    Triggers when any of: explicit args, JAX_COORDINATOR_ADDRESS env,
    or Cloud-TPU pod metadata env (TPU_WORKER_HOSTNAMES with >1 host).
    Returns True if initialize() was called.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True

    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    hostnames = [
        h for h in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if h
    ]

    explicit = coordinator_address or env_np or num_processes
    multi_tpu_pod = len(hostnames) > 1
    if not explicit and not multi_tpu_pod:
        return False

    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes or env_np:
        kwargs["num_processes"] = int(num_processes or env_np)
    if process_id is not None or env_pid is not None:
        kwargs["process_id"] = int(process_id if process_id is not None else env_pid)
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True
    return True


def is_main_process() -> bool:
    """True on process 0 - the single writer for checkpoints, metric JSON
    snapshots and preview images on a pod (the reference gates all I/O on
    accelerate's is_main_process, denoising_diffusion_pytorch.py:
    1766,1783,1863).  Compute must still run on EVERY process (skipping a
    jitted collective program on some hosts deadlocks); only the file
    writes are gated."""
    import jax

    return jax.process_index() == 0
