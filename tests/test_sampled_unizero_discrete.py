"""Discrete Sampled-UniZero (reference lzero/policy/sampled_unizero.py
continuous_action_space=False branch + sampled_unizero_model.py discrete
head): the transformer world model with K candidates drawn without
replacement from the categorical head and the CE-over-sampled policy loss.

Covers a 2-iteration jitted train step, a micro stateful collect with a
legal mask (the KV-cache path), and the adaptive-entropy interaction.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.unittest

B, A, Ks, K = 2, 5, 3, 2


def _policy():
    from lightzero_tpu.policy.sampled_unizero import SampledUniZeroPolicy

    cfg = SampledUniZeroPolicy.default_config()
    cfg.num_unroll_steps = K
    cfg.td_steps = 2
    cfg.num_simulations = 3
    cfg.batch_size = B
    cfg.num_of_sampled_actions = Ks
    cfg.model.observation_shape = 4
    cfg.model.action_space_size = A
    cfg.model.continuous_action_space = False
    cfg.model.embed_dim = 32
    cfg.model.num_layers = 1
    cfg.model.num_heads = 2
    cfg.model.max_tokens = 2 * K + 2
    cfg.model.support_scale = 5
    return SampledUniZeroPolicy(cfg)


def test_discrete_suz_train_steps():
    from lightzero_tpu.policy.muzero import TrainBatch
    from lightzero_tpu.policy.sampled_muzero import SampledTrainBatch

    policy = _policy()
    assert policy.discrete
    base = TrainBatch(
        obs=jnp.ones((B, K + 1, 4), jnp.float32),
        actions=jnp.zeros((B, K), jnp.int32),
        mask=jnp.ones((B, K), jnp.float32),
        target_reward=jnp.full((B, K), 0.5, jnp.float32),
        target_value=jnp.ones((B, K + 1), jnp.float32),
        target_policy=jnp.full((B, K + 1, Ks), 1.0 / Ks, jnp.float32),
        weights=jnp.ones((B,), jnp.float32),
        chance=None,
    )
    sampled = jnp.tile(jnp.asarray([0.0, 2.0, 4.0]), (B, K + 1, 1))
    state = policy.init_train_state(jax.random.PRNGKey(0))
    step = jax.jit(policy._forward_learn)
    batch = SampledTrainBatch(base=base, sampled_actions=sampled)
    for _ in range(2):
        state, logs, _ = step(state, batch)
    assert np.isfinite(float(logs["total_loss"]))
    # discrete branch: policy loss is CE over the sampled ids -> bounded by
    # log of the masked space; a uniform target over Ks gives ~log(Ks) scale
    assert float(logs["policy_loss"]) < 3 * (K + 1) * np.log(A)


def test_discrete_suz_collect_stateful():
    policy = _policy()
    params = policy.model.init_params(jax.random.PRNGKey(0), batch_size=B, K=K)
    legal = jnp.ones((B, A), bool).at[:, 0].set(False)
    cache = policy.init_collect_state(B)
    fwd = jax.jit(policy._forward_collect_stateful, static_argnames=("deterministic",))
    out, new_cache = fwd(
        params, jax.random.PRNGKey(1),
        jnp.ones((B, 4), jnp.float32), legal,
        jnp.full((B,), -1, jnp.int32),
        jnp.asarray(1.0, jnp.float32), jnp.asarray(0.0, jnp.float32),
        cache,
    )
    acts = np.asarray(out["action"])
    rsa = np.asarray(out["root_sampled_actions"])
    vc = np.asarray(out["visit_counts"])
    assert acts.dtype.kind == "i" and ((acts >= 1) & (acts < A)).all()
    assert rsa.shape == (B, Ks) and not (rsa == 0).any()  # mask respected
    assert vc.shape == (B, Ks) and vc.sum(-1).min() >= 3
    # the rolling cache advanced by [obs token, action token]
    assert int(new_cache.next_pos[0]) == int(cache.next_pos[0]) + 2
