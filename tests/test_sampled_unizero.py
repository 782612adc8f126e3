"""Sampled UniZero tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [pytest.mark.unittest, pytest.mark.slow]  # compile-heavy: not in the fast tier


def _policy():
    from lightzero_tpu.policy.sampled_unizero import SampledUniZeroPolicy

    cfg = SampledUniZeroPolicy.default_config()
    cfg.model.observation_shape = 3
    cfg.model.action_space_size = 1
    cfg.model.embed_dim = 32
    cfg.model.num_layers = 1
    cfg.model.num_heads = 4
    cfg.model.max_tokens = 16
    cfg.model.support_scale = 5
    cfg.num_simulations = 5
    cfg.num_of_sampled_actions = 4
    cfg.num_unroll_steps = 3
    return SampledUniZeroPolicy(cfg)


def test_sampled_unizero_collect_and_learn():
    from lightzero_tpu.policy.muzero import TrainBatch
    from lightzero_tpu.policy.sampled_muzero import SampledTrainBatch

    policy = _policy()
    params = policy.model.init_params(jax.random.PRNGKey(0), batch_size=2, K=3)
    state0 = policy.init_collect_state(2)
    out, new_state = jax.jit(
        policy._forward_collect_stateful, static_argnames=("deterministic",)
    )(
        params, jax.random.PRNGKey(1), jnp.ones((2, 3)), jnp.ones((2, 1), bool),
        jnp.full((2,), -1, jnp.int32), jnp.asarray(1.0), jnp.asarray(0.0),
        state0, deterministic=False,
    )
    assert out["action"].shape == (2, 1)
    assert int(np.asarray(out["visit_counts"]).sum()) == 10
    # context advanced by obs + action tokens
    assert int(new_state.next_pos[0]) == 2

    K, B = 3, 4
    batch = SampledTrainBatch(
        base=TrainBatch(
            obs=jnp.ones((B, K + 1, 3)),
            actions=jnp.zeros((B, K, 1)),
            mask=jnp.ones((B, K)),
            target_reward=jnp.ones((B, K)),
            target_value=jnp.ones((B, K + 1)),
            target_policy=jnp.full((B, K + 1, 4), 0.25),
            weights=jnp.ones((B,)),
        ),
        sampled_actions=jnp.zeros((B, K + 1, 4, 1)),
    )
    state = policy.init_train_state(jax.random.PRNGKey(2))
    state, logs, priority = policy.forward_learn(state, batch)
    assert np.isfinite(float(logs["total_loss"]))
    assert np.isfinite(float(logs["obs_loss"]))
