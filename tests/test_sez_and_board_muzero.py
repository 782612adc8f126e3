"""Sampled EfficientZero + board-game MuZero target tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.unittest


def test_sez_collect_and_learn():
    from lightzero_tpu.policy.sampled_efficientzero import SampledEfficientZeroPolicy
    from lightzero_tpu.policy.muzero import TrainBatch
    from lightzero_tpu.policy.sampled_muzero import SampledTrainBatch

    cfg = SampledEfficientZeroPolicy.default_config()
    cfg.model.observation_shape = 3
    cfg.model.action_space_size = 1
    cfg.model.latent_state_dim = 16
    cfg.model.lstm_hidden_size = 16
    cfg.model.support_scale = 5
    cfg.num_simulations = 5
    cfg.num_of_sampled_actions = 4
    cfg.lstm_horizon_len = 2
    policy = SampledEfficientZeroPolicy(cfg)
    params = policy.model.init_params(jax.random.PRNGKey(0), batch_size=2)
    out = policy.forward_collect(
        params, jax.random.PRNGKey(1), jnp.ones((2, 3)), jnp.ones((2, 1), bool)
    )
    assert out["action"].shape == (2, 1)
    assert int(np.asarray(out["visit_counts"]).sum()) == 10

    K = cfg.num_unroll_steps
    B = 3
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
    assert np.isfinite(float(logs["value_prefix_loss"]))


def test_board_game_value_targets():
    from lightzero_tpu.buffers import EpisodeRecord, GameBuffer
    from lightzero_tpu.policy import MuZeroPolicy

    cfg = MuZeroPolicy.default_config()
    cfg.model.latent_state_dim = 16
    cfg.model.support_scale = 5
    cfg.env_type = "board_games"
    cfg.discount_factor = 1.0
    policy = MuZeroPolicy(cfg)
    state = policy.init_train_state(jax.random.PRNGKey(0))
    buffer = GameBuffer(cfg, policy)
    assert buffer.board_mode

    # 5-move game: players 1,2,1,2,1; player 1 wins on the last move
    T, A = 5, 3
    ep = EpisodeRecord(
        obs=np.random.RandomState(0).randn(T, 4).astype(np.float32),
        actions=np.zeros(T, np.int64),
        rewards=np.asarray([0, 0, 0, 0, 1], np.float32),
        child_visits=np.full((T, A), 1.0 / A, np.float32),
        root_values=np.zeros(T, np.float32),
        legal_mask=np.ones((T, A), bool),
        to_play=np.asarray([1, 2, 1, 2, 1], np.int64),
    )
    buffer.push_episodes([ep])
    batch, idx = buffer.sample(4, state.target_params)
    tv = np.asarray(batch.target_value)
    # check each sampled position's step-0 target: +1 for player-1 positions,
    # -1 for player-2 positions
    for b, flat_i in enumerate(idx):
        pos = int(buffer._flat_pos[flat_i])
        expected = 1.0 if pos % 2 == 0 else -1.0
        assert tv[b, 0] == expected, (pos, tv[b])
