"""Smoke tests: ReZero buffer reanalyze, RND entry, multitask entry."""
import numpy as np
import pytest

import jax

pytestmark = [pytest.mark.unittest, pytest.mark.slow]  # compile-heavy: not in the fast tier


def test_rezero_buffer_reanalyze():
    from lightzero_tpu.buffers import GameBuffer
    from lightzero_tpu.policy import MuZeroPolicy
    from tests_helpers_buffers import fake_episode

    cfg = MuZeroPolicy.default_config()
    cfg.model.latent_state_dim = 16
    cfg.model.support_scale = 5
    cfg.num_simulations = 4
    policy = MuZeroPolicy(cfg)
    state = policy.init_train_state(jax.random.PRNGKey(0))
    buffer = GameBuffer(cfg, policy)
    eps = [fake_episode(T=15, seed=i) for i in range(3)]
    before = [e.child_visits.copy() for e in eps]
    buffer.push_episodes(eps)
    n = buffer.reanalyze_buffer(state.target_params, jax.random.PRNGKey(1),
                                reanalyze_batch_size=16, partition=0.5)
    assert n > 0
    # newest episode's stored policies were rewritten by fresh search
    after = buffer._episodes[-1].child_visits
    assert not np.allclose(after, before[-1], atol=1e-4)
    np.testing.assert_allclose(after.sum(-1), 1.0, rtol=1e-4)


def test_rnd_entry_smoke(tmp_path):
    from lightzero_tpu.config import Config
    from lightzero_tpu.entry import train_muzero_with_reward_model

    cfg = Config(
        dict(
            exp_name=str(tmp_path / "rnd_smoke"),
            env=dict(env_id="CartPole-v0", stop_value=10_000, collector_env_num=2,
                     evaluator_env_num=2, n_evaluator_episode=2),
            policy=dict(
                model=dict(observation_shape=4, action_space_size=2, model_type="mlp",
                           latent_state_dim=16, support_scale=10),
                num_simulations=3, batch_size=8, update_per_collect=2, n_episode=1,
                eval_freq=1000, intrinsic_reward_weight=0.05,
            ),
        )
    )
    policy, state, stats = train_muzero_with_reward_model(
        cfg, seed=0, max_env_step=600, max_train_iter=4
    )
    assert stats["train_iter"] > 0


def test_multitask_entry_smoke(tmp_path):
    from lightzero_tpu.config import Config
    from lightzero_tpu.entry import train_muzero_multitask

    def task_cfg(name, stop):
        return Config(
            dict(
                exp_name=str(tmp_path / f"mt_{name}"),
                env=dict(env_id="CartPole-v0", stop_value=stop, collector_env_num=2,
                         evaluator_env_num=2, n_evaluator_episode=2),
                policy=dict(
                    model=dict(observation_shape=4, action_space_size=2, model_type="mlp",
                               latent_state_dim=16, support_scale=10),
                    num_simulations=3, batch_size=16, update_per_collect=2, n_episode=1,
                    eval_freq=1000,
                ),
            )
        )

    policy, state, stats = train_muzero_multitask(
        [task_cfg("a", 195), task_cfg("b", 150)], seed=0, max_env_step=800, max_train_iter=4
    )
    assert stats["train_iter"] > 0
    assert len(stats["task_returns"]) == 2


def test_create_env_forwards_top_level_keys():
    """create_env must forward battle_mode/board_size-style top-level env
    keys to the constructor (regression: they were dropped, silently turning
    play_with_bot_mode into self_play_mode for board games)."""
    from lightzero_tpu.config import Config
    from lightzero_tpu.entry.train_muzero import create_env

    env = create_env(Config(dict(type="connect4", battle_mode="play_with_bot_mode")))
    assert env.battle_mode == "play_with_bot_mode"
    env2 = create_env(Config(dict(type="go", board_size=5, komi=5.5)))
    assert env2.S == 5 and env2.komi == 5.5
    # env_kwargs still wins over top-level duplicates
    env3 = create_env(Config(dict(type="go", board_size=5,
                                  env_kwargs=dict(board_size=7))))
    assert env3.S == 7
