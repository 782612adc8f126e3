"""Multi-chip dry run, self-contained and platform-forced.

Run as ``python -m lightzero_tpu.parallel.dryrun <n_devices>``: forces the
CPU platform with ``n_devices`` virtual XLA devices (the axon plugin pins
JAX_PLATFORMS, so the env var alone is NOT enough — jax.config.update must
run before backend init), then exercises the FULL multi-device story over
an n-device 'dp' mesh:

  1. MuZero train step (sharded loss/params == single-device)
  2. collect-search + reanalyze sharded along the tree batch dim
     (visit counts exactly == single-device)
  3. UniZero (transformer world model) train step
  4. multitask task->device-block partition step — REUSES the phase-1
     compiled executables (same shapes/policy), so it adds no compile time
  plus the jax.distributed multi-host scaffolding helpers (world_size 1
  path; the multi-host path is the same code).

This is what __graft_entry__.dryrun_multichip invokes in a subprocess: the
parent process may already have initialized the TPU backend (entry()
compile check), and a JAX backend cannot be switched after first use —
round 1 failed exactly there (MULTICHIP_r01.json: libtpu mismatch because
the dryrun ran against the TPU client instead of a CPU virtual mesh).

Compile budget note: everything here runs on ONE host CPU core; the fused
search is the slowest XLA compile. Phases share jitted closures wherever
shapes allow, and the search phase uses a small model/simulation budget.
"""
from __future__ import annotations

import os
import sys
import time


def _force_cpu(n_devices: int) -> None:
    flags = os.environ.get("XLA_FLAGS", "")
    want = f"--xla_force_host_platform_device_count={n_devices}"
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " " + want).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")


def _make_muzero(n_devices):
    import jax

    from lightzero_tpu.policy import MuZeroPolicy

    cfg = MuZeroPolicy.default_config()
    cfg.model.observation_shape = 4
    cfg.model.action_space_size = 2
    cfg.model.latent_state_dim = 32
    cfg.model.support_scale = 25
    cfg.model.self_supervised_learning_loss = True
    cfg.ssl_loss_weight = 2.0
    cfg.num_simulations = 10
    cfg.batch_size = max(16, n_devices * 2)
    policy = MuZeroPolicy(cfg)
    state = policy.init_train_state(jax.random.PRNGKey(0))
    return policy, state


def _mz_batch(policy, B, K=5, target_value=None):
    import jax.numpy as jnp

    from lightzero_tpu.policy.muzero import TrainBatch

    A = 2
    tv = jnp.ones((B, K + 1)) if target_value is None else target_value
    return TrainBatch(
        obs=jnp.ones((B, K + 1, 4), jnp.float32),
        actions=jnp.zeros((B, K), jnp.int32),
        mask=jnp.ones((B, K), jnp.float32),
        target_reward=jnp.ones((B, K), jnp.float32),
        target_value=tv.astype(jnp.float32),
        target_policy=jnp.full((B, K + 1, A), 1.0 / A, jnp.float32),
        weights=jnp.ones((B,), jnp.float32),
    )


def _muzero_dp_step(ctx, n_devices) -> str:
    """MuZero DP train step: sharded loss/params == single-device."""
    import jax
    import numpy as np

    from lightzero_tpu.parallel import dp_train_step, make_mesh

    policy, state = _make_muzero(n_devices)
    B = int(policy.cfg.batch_size)
    batch = _mz_batch(policy, B)

    # single-device reference step (no donation: state reused below)
    jit_ref = jax.jit(policy._forward_learn)
    ref_state, ref_logs, _ = jit_ref(state, batch)
    ref_loss = float(ref_logs["total_loss"])

    mesh = make_mesh(n_devices)
    step = dp_train_step(policy, mesh, donate=False)
    with mesh:
        out_state, logs, priority = step(state, batch)
    jax.block_until_ready(out_state.params)

    loss = float(logs["total_loss"])
    assert np.isfinite(loss), f"non-finite sharded loss {loss}"
    np.testing.assert_allclose(loss, ref_loss, rtol=1e-4, err_msg="dp loss != single-device loss")
    ref_leaves = jax.tree_util.tree_leaves(ref_state.params)
    dp_leaves = jax.tree_util.tree_leaves(out_state.params)
    for a, b in zip(ref_leaves, dp_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)
    n_used = {d for leaf in jax.tree_util.tree_leaves(priority) for d in leaf.devices()}
    assert len(n_used) == n_devices, f"priority sharded over {len(n_used)} != {n_devices} devices"
    # share the compiled executables + mesh with the multitask phase
    ctx.update(policy=policy, state=state, mesh=mesh, step=step, jit_ref=jit_ref)
    return f"muzero_dp_step loss={loss:.4f}==ref"


def _multitask_partition_step(ctx, n_devices) -> str:
    """Multitask: tasks partitioned over the mesh — task i's samples live
    on a contiguous device block (the reference's task->rank partition,
    train_unizero_multitask_segment_ddp.py:130-154), per-task weights
    folded into per-sample IS weights, ONE dp step; the in-loss global
    mean is the cross-task weighted reduction (reference :460-560).
    Shapes match phase 1, so both executables are jit-cache hits."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lightzero_tpu.parallel.distributed import partition_tasks

    policy, state = ctx["policy"], ctx["state"]
    mesh, step, jit_ref = ctx["mesh"], ctx["step"], ctx["jit_ref"]
    B = int(policy.cfg.batch_size)
    num_tasks = 2
    per_task = B // num_tasks  # task blocks contiguous over the device axis
    task_weights = jnp.asarray([1.5, 0.5])
    rows_task = jnp.repeat(jnp.arange(num_tasks), per_task)  # (B,)
    batch = _mz_batch(
        policy, B, target_value=rows_task[:, None] * jnp.ones((B, policy.num_unroll_steps + 1))
    )
    batch = batch._replace(weights=task_weights[rows_task])

    ref_state, ref_logs, _ = jit_ref(state, batch)
    ref_loss = float(ref_logs["total_loss"])
    with mesh:
        out_state, logs, _ = step(state, batch)
    jax.block_until_ready(out_state.params)
    loss = float(logs["total_loss"])
    np.testing.assert_allclose(loss, ref_loss, rtol=1e-4,
                               err_msg="multitask dp loss != single-device")
    # the static task->process partition helper used by multi-host entries
    parts = [partition_tasks(5, rank=r, world_size=2) for r in range(2)]
    assert parts == [[0, 1, 2], [3, 4]], parts
    return f"multitask_partition loss={loss:.4f}==ref tasks@devices"


def _sharded_search(ctx, n_devices) -> str:
    """Collect-search + reanalyze with roots sharded over the mesh: the
    fused MCTS (selection/expand/backup + nets) partitions along the tree
    batch dim; visit counts must match the single-device search exactly
    (reference: per-rank collectors each searching their own envs,
    muzero_collector.py:10-11)."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lightzero_tpu.parallel import make_mesh, replicate, shard_batch
    from lightzero_tpu.policy import MuZeroPolicy

    cfg = MuZeroPolicy.default_config()
    cfg.model.observation_shape = 4
    cfg.model.action_space_size = 3
    cfg.model.latent_state_dim = 16
    cfg.model.support_scale = 25
    cfg.num_simulations = 6
    policy = MuZeroPolicy(cfg)
    params = policy.model.init_params(jax.random.PRNGKey(0), batch_size=2)

    B = max(8, n_devices)
    rng = jax.random.PRNGKey(7)
    obs = jnp.linspace(-1, 1, B * 4).reshape(B, 4)
    legal = jnp.ones((B, 3), bool)
    to_play = jnp.full((B,), -1, jnp.int32)
    temp = jnp.asarray(1.0, jnp.float32)
    eps = jnp.asarray(0.0, jnp.float32)

    collect_det = functools.partial(policy._forward_collect, deterministic=True)
    ref = jax.jit(collect_det)(params, rng, obs, legal, to_play, temp, eps)

    mesh = make_mesh(n_devices)
    repl, shard = replicate(mesh), shard_batch(mesh)
    # pjit forbids kwargs with in_shardings -> the static flag is baked in
    # via partial and every runtime arg is positional
    sharded_collect = jax.jit(
        collect_det,
        in_shardings=(repl, repl, shard, shard, shard, repl, repl),
        out_shardings=shard,
    )
    with mesh:
        out = sharded_collect(params, rng, obs, legal, to_play, temp, eps)
    jax.block_until_ready(out["visit_counts"])
    np.testing.assert_array_equal(
        np.asarray(out["visit_counts"]), np.asarray(ref["visit_counts"]),
        err_msg="sharded search visit counts != single-device",
    )
    # atol: cross-device reduction order shifts near-zero values by ~1e-8
    np.testing.assert_allclose(
        np.asarray(out["searched_value"]), np.asarray(ref["searched_value"]),
        rtol=1e-4, atol=1e-6,
    )
    devs = {d for d in out["visit_counts"].devices()}
    assert len(devs) == n_devices, f"search outputs on {len(devs)} != {n_devices} devices"

    # reanalyze: fresh MCTS policy targets with the target net, same sharding
    # (reference _compute_target_policy_reanalyzed, game_buffer_muzero.py:578)
    # returns (target_policy (B,A), root_value (B,))
    ref_re = jax.jit(policy._forward_reanalyze)(params, rng, obs, legal, to_play)
    sharded_re = jax.jit(
        policy._forward_reanalyze,
        in_shardings=(repl, repl, shard, shard, shard),
        out_shardings=shard,
    )
    with mesh:
        out_re = sharded_re(params, rng, obs, legal, to_play)
    np.testing.assert_allclose(
        np.asarray(out_re[0]), np.asarray(ref_re[0]), rtol=1e-5, atol=1e-7,
        err_msg="sharded reanalyze policy != single-device",
    )
    return "sharded_search+reanalyze exact"


def _unizero_dp_step(ctx, n_devices) -> str:
    """UniZero (transformer world model) DP train step over the mesh."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lightzero_tpu.parallel import dp_train_step, make_mesh
    from lightzero_tpu.policy.muzero import TrainBatch
    from lightzero_tpu.policy.unizero import UniZeroPolicy

    cfg = UniZeroPolicy.default_config()
    cfg.model.observation_shape = 4
    cfg.model.action_space_size = 2
    cfg.model.embed_dim = 32
    cfg.model.num_layers = 1
    cfg.model.num_heads = 2
    cfg.model.max_tokens = 12
    cfg.model.support_scale = 5
    cfg.num_unroll_steps = 4
    cfg.num_simulations = 5
    policy = UniZeroPolicy(cfg)
    state = policy.init_train_state(jax.random.PRNGKey(0))

    B, K, A = max(8, n_devices), 4, 2
    batch = TrainBatch(
        obs=jnp.ones((B, K + 1, 4), jnp.float32),
        actions=jnp.zeros((B, K), jnp.int32),
        mask=jnp.ones((B, K), jnp.float32),
        target_reward=jnp.zeros((B, K), jnp.float32),
        target_value=jnp.ones((B, K + 1), jnp.float32),
        target_policy=jnp.full((B, K + 1, A), 1.0 / A, jnp.float32),
        weights=jnp.ones((B,), jnp.float32),
    )
    ref_state, ref_logs, _ = jax.jit(policy._forward_learn)(state, batch)
    ref_loss = float(ref_logs["total_loss"])
    mesh = make_mesh(n_devices)
    step = dp_train_step(policy, mesh, donate=False)
    with mesh:
        out_state, logs, _ = step(state, batch)
    jax.block_until_ready(out_state.params)
    loss = float(logs["total_loss"])
    np.testing.assert_allclose(loss, ref_loss, rtol=1e-4,
                               err_msg="unizero dp loss != single-device")
    return f"unizero_dp_step loss={loss:.4f}==ref"


def _control_plane_multiproc(ctx, n_devices) -> str:
    """Real world_size==2 control plane: two OS processes jax.distributed-
    initialize against a localhost coordinator and run collector-stat
    allreduce, eval broadcast, task-weight broadcast, and a cross-process
    global-mesh reduction (reference multi-host surface,
    train_unizero_multitask_segment_ddp.py:388-451). This is the one part
    the in-process virtual mesh cannot exercise — every distributed helper
    short-circuits at world_size 1."""
    from lightzero_tpu.parallel.dryrun_multiproc import launch

    return launch(num_processes=2)


def run(n_devices: int) -> None:
    import jax

    assert len(jax.devices()) >= n_devices, (
        f"need {n_devices} devices, have {len(jax.devices())} "
        f"({jax.devices()[0].platform})"
    )
    # multi-host scaffolding: in-process world has size 1; helpers must be
    # callable unconditionally (the multi-host path is the same code)
    from lightzero_tpu.parallel.distributed import (
        allreduce_mean_scalars,
        barrier,
        init_distributed,
        is_main_process,
    )

    info = init_distributed()
    assert info["world_size"] >= 1 and is_main_process()
    barrier("dryrun")
    red = allreduce_mean_scalars({"x": 3.0})
    assert red["x"] == 3.0

    ctx = {}
    results = []
    for phase in (_muzero_dp_step, _multitask_partition_step, _sharded_search,
                  _unizero_dp_step, _control_plane_multiproc):
        t0 = time.perf_counter()
        results.append(f"{phase(ctx, n_devices)} [{time.perf_counter() - t0:.0f}s]")
        print("phase done:", results[-1], flush=True)
    print(
        f"dryrun_multichip({n_devices}): platform={jax.devices()[0].platform} "
        + " | ".join(results)
        + " | distributed scaffolding OK"
    )


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else int(os.environ.get("N_DEVICES", "8"))
    _force_cpu(n)
    run(n)
