"""Multi-host (multi-process) runtime initialization.

The reference is single-device and has no distributed runtime at all
(SURVEY §5: no NCCL/MPI/Gloo imports anywhere in spectre.py).  On TPU the
equivalent layer is JAX's distributed runtime: one process per host, each
seeing its local chips; ``jax.distributed.initialize`` wires the processes
into one global runtime, after which ``jax.devices()`` spans the whole
slice/pod and every mesh in :mod:`fft_tpu.parallel.mesh` works unchanged —
GSPMD lowers the same collectives onto ICI within a slice and DCN across
slices.

On Cloud TPU pods the coordinator address / process count / process id are
discoverable from the metadata environment, so ``distributed_init()`` with
no arguments is the common path.  For other clusters (or manual bring-up)
pass them explicitly.

Checkpointing composes: orbax writes shards per-process into one directory
(`train/checkpoint.py`), so restore-after-restart only needs the same
process topology.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_INITIALIZED = False


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[list] = None,
) -> None:
    """Initialize the multi-process JAX runtime (idempotent).

    With no arguments, relies on JAX's built-in cluster auto-detection
    (Cloud TPU / GKE / Slurm / Open MPI environments).  Explicit arguments
    override, for bare-metal clusters:

    - ``coordinator_address``: "host:port" of process 0.
    - ``num_processes`` / ``process_id``: global process topology.
    - ``local_device_ids``: restrict this process to a subset of its local
      chips (rarely needed).

    Single-process runs (num_processes == 1 or an unset environment with
    no cluster detected) are a no-op, so library code can call this
    unconditionally.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    explicit = coordinator_address is not None
    # TPU_WORKER_HOSTNAMES with a single entry (e.g. "localhost" on a
    # one-host dev box) is not a cluster.
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    auto_env = ("," in hosts) or any(k in os.environ for k in (
        "COORDINATOR_ADDRESS", "SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE",
        "MEGASCALE_COORDINATOR_ADDRESS"))
    if not explicit and not auto_env:
        return                      # single-host: nothing to do
    if num_processes == 1:
        return
    from jax._src import xla_bridge
    if xla_bridge.backends_are_initialized():
        # Too late to wire up the multi-process runtime (jax.distributed
        # must run before the first backend touch).  In-process callers
        # (tests driving cli.main after using jax) get the single-process
        # runtime they already have.
        import warnings
        warnings.warn("distributed_init: backend already initialized; "
                      "running single-process")
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _INITIALIZED = True


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    """True on the process that should write checkpoints-metadata/logs."""
    return jax.process_index() == 0


def global_batch_slice(global_batch: int) -> slice:
    """This process's contiguous slice of a data-parallel global batch
    (per-process loaders feed ``jax.make_array_from_process_local_data``;
    see train/data.py)."""
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
