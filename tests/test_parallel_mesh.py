"""Multi-device data-parallel tests over the 8-virtual-CPU-device mesh
(conftest forces --xla_force_host_platform_device_count=8).

Verifies VERDICT r1 item 1: the dp sharding path must be executed by tests,
with numerics matching the single-device step (reference DDP semantics:
manual grad all-reduce, lzero/policy/muzero.py:599-600)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightzero_tpu.parallel import mesh as mesh_lib
from lightzero_tpu.parallel.mesh import make_mesh, dp_train_step, replicate, shard_batch

pytestmark = [pytest.mark.unittest, pytest.mark.slow]  # compile-heavy: not in the fast tier


def _make_policy(batch_size=16):
    from lightzero_tpu.policy import MuZeroPolicy

    cfg = MuZeroPolicy.default_config()
    cfg.model.observation_shape = 4
    cfg.model.action_space_size = 2
    cfg.model.latent_state_dim = 32
    cfg.model.support_scale = 10
    cfg.batch_size = batch_size
    cfg.num_simulations = 6
    return MuZeroPolicy(cfg)


def _make_batch(policy, B, K=5, A=2, seed=0):
    from lightzero_tpu.policy.muzero import TrainBatch

    r = np.random.RandomState(seed)
    return TrainBatch(
        obs=jnp.asarray(r.randn(B, K + 1, 4), jnp.float32),
        actions=jnp.asarray(r.randint(0, A, (B, K)), jnp.int32),
        mask=jnp.ones((B, K), jnp.float32),
        target_reward=jnp.asarray(r.randn(B, K), jnp.float32),
        target_value=jnp.asarray(r.randn(B, K + 1), jnp.float32),
        target_policy=jnp.full((B, K + 1, A), 1.0 / A, jnp.float32),
        weights=jnp.ones((B,), jnp.float32),
    )


def test_make_mesh_shapes():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8,)
    assert mesh.axis_names == ("dp",)
    sub = make_mesh(4)
    assert sub.devices.shape == (4,)


def test_dp_train_step_matches_single_device():
    """One dp step over 8 devices produces the same loss and updated params
    as the unsharded step — the gradient psum must be a true mean."""
    policy = _make_policy()
    state = policy.init_train_state(jax.random.PRNGKey(0))
    batch = _make_batch(policy, B=16)

    ref_state, ref_logs, ref_pri = jax.jit(policy._forward_learn)(state, batch)

    mesh = make_mesh(8)
    step = dp_train_step(policy, mesh, donate=False)
    with mesh:
        dp_state, dp_logs, dp_pri = step(state, batch)
    jax.block_until_ready(dp_state.params)

    np.testing.assert_allclose(
        float(dp_logs["total_loss"]), float(ref_logs["total_loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_state.params),
        jax.tree_util.tree_leaves(dp_state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ref_pri), np.asarray(dp_pri), rtol=1e-4, atol=1e-6)
    # priorities really live sharded across all 8 devices
    devs = {d for leaf in jax.tree_util.tree_leaves(dp_pri) for d in leaf.devices()}
    assert len(devs) == 8


def test_dp_multiple_steps_stay_in_sync():
    """Params remain replicated (identical) across devices after several
    donated steps — the canonical DDP drift check."""
    policy = _make_policy()
    state = policy.init_train_state(jax.random.PRNGKey(1))
    mesh = make_mesh(8)
    step = dp_train_step(policy, mesh, donate=True)
    with mesh:
        for i in range(3):
            state, logs, _ = step(state, _make_batch(policy, B=16, seed=i))
    assert np.isfinite(float(logs["total_loss"]))
    # every leaf is fully replicated: shard on device 0 equals shard on 7
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated
    shards = leaf.addressable_shards
    np.testing.assert_array_equal(np.asarray(shards[0].data), np.asarray(shards[-1].data))


def test_sharded_reanalyze_search_matches_unsharded():
    """The fused MCTS reanalyze (search) runs under a dp mesh with the obs
    batch sharded and returns the same visit distributions as unsharded."""
    policy = _make_policy()
    state = policy.init_train_state(jax.random.PRNGKey(2))
    B = 16
    r = np.random.RandomState(3)
    obs = jnp.asarray(r.randn(B, 4), jnp.float32)
    legal = jnp.ones((B, 2), bool)
    to_play = jnp.full((B,), -1, jnp.int32)
    rng = jax.random.PRNGKey(7)

    pol_ref, val_ref = policy.forward_reanalyze(state.target_params, rng, obs, legal, to_play)

    mesh = make_mesh(8)
    shard = shard_batch(mesh)
    repl = replicate(mesh)
    sharded_fn = jax.jit(
        policy._forward_reanalyze,
        in_shardings=(repl, repl, shard, shard, shard),
        out_shardings=(shard, shard),
    )
    with mesh:
        pol_dp, val_dp = sharded_fn(state.target_params, rng, obs, legal, to_play)
    np.testing.assert_allclose(np.asarray(pol_ref), np.asarray(pol_dp), atol=1e-5)
    np.testing.assert_allclose(np.asarray(val_ref), np.asarray(val_dp), rtol=1e-4, atol=1e-5)


def test_dryrun_module_runs_inline():
    """lightzero_tpu.parallel.dryrun.run executes on the virtual mesh (the
    subprocess wrapper is exercised by the driver; here we run the body)."""
    from lightzero_tpu.parallel import dryrun

    dryrun.run(8)
    assert mesh_lib is not None
