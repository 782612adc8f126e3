"""Device-mesh data parallelism.

Replaces the reference's torch.distributed DDP (manual per-step gradient
all-reduce, lzero/policy/muzero.py:599-600; config division by world size,
lzero/config/utils.py:15-21) with JAX SPMD: shard the batch over a 'dp' mesh
axis, replicate the TrainState, and let the partitioner insert the gradient
psum over ICI. One jitted function, no wrapper classes.

Mesh axes follow the scaling-book recipe: a 1-D 'dp' axis today; model axes
('tp' etc.) can be appended without touching the training code because the
shardings are expressed as PartitionSpecs over named axes.
"""
from __future__ import annotations

from typing import Any, Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def dp_train_step(policy, mesh: Mesh, axis_name: str = "dp", donate: bool = True):
    """jit the policy's learn step with batch sharded over the mesh.

    Returns fn(state, batch) -> (state, logs, priority); state replicated,
    batch arrays sharded along dim 0, priority sharded along dim 0. The
    mean over the global batch inside the loss becomes a cross-device
    reduction compiled onto ICI.
    """
    repl = replicate(mesh)
    shard = shard_batch(mesh, axis_name)
    # single shardings act as pytree prefixes over state/batch
    return jax.jit(
        policy._forward_learn,
        in_shardings=(repl, shard),
        out_shardings=(repl, repl, shard),
        donate_argnums=(0,) if donate else (),
    )
