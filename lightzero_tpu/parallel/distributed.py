"""Multi-host scaffolding: ``jax.distributed`` init + cross-host sync
helpers.

Role of the reference's torch.distributed/DDP plumbing (SURVEY.md §5.8:
``get_rank/get_world_size/allreduce_data``, ``dist.barrier``,
``all_gather_object`` of task returns, ``broadcast_object_list`` of task
weights — train_unizero_multitask_segment_ddp.py:388-451) rebuilt on the
JAX runtime: one process per host, parameters replicated over the global
mesh, gradient psum over ICI within a slice and DCN across slices; scalar
metadata moves through jax.experimental.multihost_utils.

Single-process runs (this image, tests, the driver's virtual-CPU dryrun)
take the same code path with world_size == 1 — initialize() is a no-op
there, so every entry can call these helpers unconditionally.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Dict[str, int]:
    """Initialize jax.distributed when launched multi-host (reference
    DDPContext role). Arguments default from the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, as set
    by TPU pod launchers); a single-process launch skips initialization
    entirely. Returns {rank, world_size}."""
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    if num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return dict(rank=get_rank(), world_size=get_world_size())


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    """Rank-0 gate for logging/checkpoint writes (reference rank0-only
    SummaryWriter, train_muzero.py:101)."""
    return jax.process_index() == 0


def barrier(name: str = "barrier"):
    """Cross-host sync point (reference dist.barrier around collect/train
    phases, train_unizero.py:188)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def all_gather_scalars(values: Dict[str, float]) -> Dict[str, np.ndarray]:
    """Gather a dict of host-local scalars from every process: returns
    {key: (world_size,) array} (reference all_gather_object of per-task
    returns, train_unizero_multitask_segment_ddp.py:388-418)."""
    world = jax.process_count()
    keys = sorted(values)
    local = np.asarray([float(values[k]) for k in keys], np.float32)
    if world == 1:
        return {k: local[i : i + 1] for i, k in enumerate(keys)}
    from jax.experimental import multihost_utils

    stacked = multihost_utils.process_allgather(local)  # (world, n_keys)
    return {k: np.asarray(stacked)[:, i] for i, k in enumerate(keys)}


def broadcast_from_main(arr: np.ndarray) -> np.ndarray:
    """Broadcast a host-side array from rank 0 to all processes (reference
    broadcast_object_list of task weights, :440-451)."""
    if jax.process_count() == 1:
        return np.asarray(arr)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.broadcast_one_to_all(np.asarray(arr)))


def allreduce_mean_scalars(values: Dict[str, float]) -> Dict[str, float]:
    """Mean-reduce host-local scalars across processes (reference
    allreduce_data of collector stats, muzero_collector.py:609-614)."""
    gathered = all_gather_scalars(values)
    return {k: float(np.mean(v)) for k, v in gathered.items()}


def partition_tasks(num_tasks: int, rank: Optional[int] = None,
                    world_size: Optional[int] = None) -> Sequence[int]:
    """Static task -> process partition (reference tasks_per_rank split,
    train_unizero_multitask_segment_ddp.py:130-154): contiguous blocks,
    remainder spread over the first ranks."""
    rank = get_rank() if rank is None else rank
    world = get_world_size() if world_size is None else world_size
    base, rem = divmod(num_tasks, world)
    start = rank * base + min(rank, rem)
    count = base + (1 if rank < rem else 0)
    return list(range(start, start + count))
