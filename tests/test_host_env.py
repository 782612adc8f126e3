"""Host (gymnasium) env adapter + collector tests (LunarLander path)."""
import numpy as np
import pytest

import jax

pytestmark = [pytest.mark.unittest, pytest.mark.slow]  # compile-heavy: not in the fast tier


def _has_gymnasium():
    try:
        import gymnasium  # noqa

        return True
    except ImportError:
        return False


pytestmark = [pytest.mark.unittest, pytest.mark.skipif(not _has_gymnasium(), reason="no gymnasium")]


def test_host_vec_env_discrete():
    from lightzero_tpu.envs.host_env import HostVecEnv

    env = HostVecEnv("CartPole-v1", num_envs=3, seed=0)
    assert env.action_space_size == 2 and not env.continuous
    obs, legal, to_play = env.reset_all()
    assert obs.shape == (3, 4) and legal.shape == (3, 2)
    obs, r, d, legal, tp = env.step(np.array([0, 1, 0]))
    assert obs.shape == (3, 4) and r.shape == (3,)


def test_host_collector_lunarlander_muzero():
    from lightzero_tpu.envs.host_env import HostVecEnv
    from lightzero_tpu.policy import MuZeroPolicy
    from lightzero_tpu.workers.host_collector import HostCollector, HostEvaluator

    cfg = MuZeroPolicy.default_config()
    cfg.model.observation_shape = 8
    cfg.model.action_space_size = 4
    cfg.model.latent_state_dim = 16
    cfg.model.support_scale = 10
    cfg.num_simulations = 3
    policy = MuZeroPolicy(cfg)
    params = policy.model.init_params(jax.random.PRNGKey(0), batch_size=2)

    env = HostVecEnv("LunarLander-v3", num_envs=2, seed=0)
    coll = HostCollector(env, policy)
    episodes, priorities, stats = coll.collect(params, min_steps=40)
    assert stats["steps"] >= 40
    ev = HostEvaluator(HostVecEnv("LunarLander-v3", num_envs=2, seed=9), policy)
    res = ev.eval(params, n_episodes=2, max_steps=300)
    assert "mean_return" in res
