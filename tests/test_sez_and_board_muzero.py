"""Sampled EfficientZero + board-game MuZero target tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [pytest.mark.unittest, pytest.mark.slow]  # compile-heavy: not in the fast tier


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
    # winner-z targets apply only to self-play trajectories (to_play
    # alternating in {1,2}); bot-mode rewards are agent-perspective and
    # keep plain n-step targets (ADVICE r1 medium #1)
    cfg.battle_mode = "self_play_mode"
    policy = MuZeroPolicy(cfg)
    state = policy.init_train_state(jax.random.PRNGKey(0))
    buffer = GameBuffer(cfg, policy)
    assert buffer.board_mode and buffer.winner_z_targets

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

    # final reward < 0 means the LAST MOVER lost: winner flips
    ep_loss = ep._replace(rewards=np.asarray([0, 0, 0, 0, -1], np.float32))
    buffer2 = GameBuffer(cfg, policy)
    buffer2.push_episodes([ep_loss])
    buffer2._rebuild_flat()
    z = buffer2._board_game_value_targets(np.asarray([0]))  # pos 0, player 1
    assert z[0, 0] == -1.0  # player 2 won

    # play_with_bot_mode: constant to_play, agent-perspective rewards →
    # winner-z must NOT be applied (losses would train as draws)
    cfg_bot = MuZeroPolicy.default_config()
    cfg_bot.model.latent_state_dim = 16
    cfg_bot.model.support_scale = 5
    cfg_bot.env_type = "board_games"
    cfg_bot.discount_factor = 1.0
    cfg_bot.battle_mode = "play_with_bot_mode"
    buffer3 = GameBuffer(cfg_bot, policy)
    assert buffer3.board_mode and not buffer3.winner_z_targets
    ep_bot = ep._replace(
        to_play=np.ones(T, np.int64),
        rewards=np.asarray([0, 0, 0, 0, -1], np.float32),  # agent lost
    )
    buffer3.push_episodes([ep_bot])
    batch3, idx3 = buffer3.sample(4, state.target_params)
    tv3 = np.asarray(batch3.target_value)
    for b, flat_i in enumerate(idx3):
        pos = int(buffer3._flat_pos[flat_i])
        # n-step targets propagate the -1 terminal reward (discount=1,
        # td_steps >= episode tail), never 0-as-draw
        assert tv3[b, 0] <= -0.5 or pos + buffer3.td_steps < T, (pos, tv3[b])
