"""Multi-host initialization (the RPC/MPI distribution analog).

The reference distributes via its RPC backend / MPI; the TPU-native
equivalent is jax.distributed over ICI/DCN: every host runs the same
program, jax.distributed.initialize() wires the coordination service,
and the global mesh spans all hosts' devices. Shardings defined in
tpullama.parallel.sharding work unchanged — XLA routes collectives over
ICI within a slice and DCN across slices.

Single-host environments (this repo's CI) exercise the same code path
with num_processes=1.
"""

from __future__ import annotations

import os


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID —
    auto-detected on Cloud TPU pods, where no args are needed).

    Returns a summary dict {process_id, num_processes, n_local, n_global}.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id or 0,
        )
    return {
        "process_id": jax.process_index(),
        "num_processes": jax.process_count(),
        "n_local": jax.local_device_count(),
        "n_global": jax.device_count(),
    }


def global_mesh(n_dp: int | None = None, n_tp: int | None = None):
    """Build the (dp, tp) mesh over ALL hosts' devices (multi-host aware
    make_mesh). Defaults: tp = devices per host (ICI-local), dp = hosts."""
    import jax

    from .sharding import make_mesh

    n_global = jax.device_count()
    if n_tp is None:
        n_tp = jax.local_device_count()
    if n_dp is None:
        n_dp = n_global // n_tp
    return make_mesh(n_dp=n_dp, n_tp=n_tp)
