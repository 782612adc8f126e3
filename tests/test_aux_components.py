"""Tests for auxiliary components: RND reward model, image augmentation,
Agent API, Gumbel AlphaZero."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.unittest


def test_rnd_reward_model():
    from lightzero_tpu.reward_model import RNDRewardModel

    rm = RNDRewardModel(obs_dim=4, intrinsic_reward_weight=0.1)
    state = rm.init_state(jax.random.PRNGKey(0))
    obs = np.random.RandomState(0).randn(32, 4).astype(np.float32)
    rewards = np.zeros(32, np.float32)
    # training reduces prediction error on seen data
    losses = []
    for _ in range(50):
        state, loss = rm.train(state, obs)
        losses.append(loss)
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])
    state, new_r, intrinsic = rm.estimate(state, obs, rewards)
    assert new_r.shape == (32,)
    # novel obs gets higher intrinsic reward than trained obs
    novel = np.random.RandomState(9).randn(32, 4).astype(np.float32) * 5
    state, _, intr_novel = rm.estimate(state, novel, rewards)
    assert float(jnp.mean(intr_novel)) > float(jnp.mean(intrinsic))


def test_augment_batch():
    from lightzero_tpu.ops.augment import augment_batch, intensity, random_shift

    imgs = jnp.ones((4, 16, 16, 3))
    out = jax.jit(augment_batch)(jax.random.PRNGKey(0), imgs)
    assert out.shape == imgs.shape
    # intensity changes values; shift preserves constants
    shifted = random_shift(jax.random.PRNGKey(1), imgs)
    np.testing.assert_allclose(np.asarray(shifted), 1.0)
    jittered = intensity(jax.random.PRNGKey(2), imgs)
    assert not np.allclose(np.asarray(jittered), 1.0)


def test_agent_api_train_and_eval(tmp_path):
    from lightzero_tpu.agent import MuZeroAgent
    from lightzero_tpu.config import Config

    cfg = Config(
        dict(
            exp_name=str(tmp_path / "agent_exp"),
            env=dict(env_id="CartPole-v0", stop_value=10_000, collector_env_num=2,
                     evaluator_env_num=2, n_evaluator_episode=2),
            policy=dict(
                model=dict(observation_shape=4, action_space_size=2, model_type="mlp",
                           latent_state_dim=16, support_scale=10),
                num_simulations=3, batch_size=8, update_per_collect=2, n_episode=1,
                eval_freq=1000,
            ),
        )
    )
    agent = MuZeroAgent(cfg=cfg, seed=0)
    stats = agent.train(max_env_step=600, max_train_iter=4)
    assert stats["train_iter"] > 0
    res = agent.batch_evaluate(n_episodes=2)
    assert "mean_return" in res


def test_agent_bundled_config_unknown_env():
    from lightzero_tpu.agent import MuZeroAgent

    with pytest.raises(KeyError):
        MuZeroAgent(env_id="NoSuchEnv-v0")


def test_gumbel_alphazero_tactics():
    from lightzero_tpu.envs.board.tictactoe import TicTacToeEnv
    from lightzero_tpu.policy.gumbel_alphazero import GumbelAlphaZeroPolicy
    from tests_helpers_boards import batched_state

    env = TicTacToeEnv("self_play_mode")
    cfg = GumbelAlphaZeroPolicy.default_config()
    cfg.num_simulations = 40
    cfg.max_num_considered_actions = 9
    policy = GumbelAlphaZeroPolicy(cfg, env)
    params = policy.model.init_params(jax.random.PRNGKey(0))
    # immediate win at 2 for player 1
    s = batched_state([[1, 1, 0, 2, 2, 0, 0, 0, 0]], to_play=[1])
    out = policy.forward_eval(params, jax.random.PRNGKey(1), s)
    assert int(out["action"][0]) == 2, np.asarray(out["raw_visit_counts"])
