"""Reanalyze pipeline tests (reference _compute_target_policy_reanalyzed,
game_buffer_muzero.py:578-731)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.unittest


def _make_policy_and_buffer(reanalyze_ratio):
    from lightzero_tpu.buffers import GameBuffer
    from lightzero_tpu.policy import MuZeroPolicy

    cfg = MuZeroPolicy.default_config()
    cfg.model.latent_state_dim = 16
    cfg.model.support_scale = 5
    cfg.num_simulations = 4
    cfg.reanalyze_ratio = reanalyze_ratio
    policy = MuZeroPolicy(cfg)
    buffer = GameBuffer(cfg, policy)
    return policy, buffer


def _fake_episode(T=20, A=2, obs_dim=4, seed=0):
    from lightzero_tpu.buffers import EpisodeRecord

    rng = np.random.RandomState(seed)
    visits = rng.randint(1, 10, size=(T, A)).astype(np.float32)
    return EpisodeRecord(
        obs=rng.randn(T, obs_dim).astype(np.float32),
        actions=rng.randint(0, A, size=T),
        rewards=rng.randn(T).astype(np.float32),
        child_visits=visits / visits.sum(-1, keepdims=True),
        root_values=rng.randn(T).astype(np.float32),
        legal_mask=np.ones((T, A), bool),
        to_play=np.full(T, -1),
    )


def test_reanalyzed_targets_differ_from_stored():
    policy, buffer = _make_policy_and_buffer(reanalyze_ratio=1.0)
    state = policy.init_train_state(jax.random.PRNGKey(0))
    buffer.push_episodes([_fake_episode(seed=i) for i in range(3)])
    batch, idx = buffer.sample(8, state.target_params)
    tp = np.asarray(batch.target_policy)
    # all valid rows sum to ~1 (fresh search distributions)
    sums = tp.sum(-1)
    assert ((np.abs(sums - 1.0) < 1e-4) | (sums == 0)).all()
    # fresh targets are NOT the stored random visit distributions
    stored = np.stack(
        [buffer._episodes[buffer._flat_ep[i]].child_visits[buffer._flat_pos[i]] for i in idx]
    )
    assert not np.allclose(tp[:, 0], stored, atol=1e-3)


def test_reanalyze_ratio_zero_uses_stored():
    policy, buffer = _make_policy_and_buffer(reanalyze_ratio=0.0)
    state = policy.init_train_state(jax.random.PRNGKey(0))
    buffer.push_episodes([_fake_episode(seed=7)])
    batch, idx = buffer.sample(4, state.target_params)
    tp = np.asarray(batch.target_policy)
    stored = np.stack(
        [buffer._episodes[buffer._flat_ep[i]].child_visits[buffer._flat_pos[i]] for i in idx]
    )
    np.testing.assert_allclose(tp[:, 0], stored, atol=1e-6)


def test_mixed_ratio():
    policy, buffer = _make_policy_and_buffer(reanalyze_ratio=0.5)
    state = policy.init_train_state(jax.random.PRNGKey(0))
    buffer.push_episodes([_fake_episode(seed=3)])
    batch, idx = buffer.sample(8, state.target_params)
    tp = np.asarray(batch.target_policy)
    stored = np.stack(
        [buffer._episodes[buffer._flat_ep[i]].child_visits[buffer._flat_pos[i]] for i in idx]
    )
    # second half must be exactly the stored distributions
    np.testing.assert_allclose(tp[4:, 0], stored[4:], atol=1e-6)
