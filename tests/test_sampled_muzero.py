"""Sampled MuZero (continuous actions) tests + Pendulum env."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [pytest.mark.unittest, pytest.mark.slow]  # compile-heavy: not in the fast tier


def test_pendulum_env():
    from lightzero_tpu.envs.pendulum import PendulumEnv

    env = PendulumEnv()
    s, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (3,)
    step = jax.jit(env.step)(s, jnp.asarray([0.5]), jax.random.PRNGKey(1))
    assert float(step.reward) <= 0.0
    assert not bool(step.done)
    # terminates at 200 steps
    s2 = step.state._replace(t=jnp.asarray(199, jnp.int32))
    step2 = env.step(s2, jnp.asarray([0.0]), jax.random.PRNGKey(2))
    assert bool(step2.done)


def test_gaussian_tanh_logp_consistency():
    from lightzero_tpu.policy.sampled_muzero import (
        gaussian_tanh_logp,
        gaussian_tanh_sample,
    )

    mu = jnp.asarray([[0.3, -0.2]])
    sigma = jnp.asarray([[0.5, 0.8]])
    # 'squashed' space: the sample-returned weight equals the tanh-corrected
    # density recomputed from the squashed action (the TRAINING density)
    actions, logp = gaussian_tanh_sample(jax.random.PRNGKey(0), mu, sigma, 6,
                                         prior_space="squashed")
    logp2 = gaussian_tanh_logp(actions[0], mu, sigma)
    np.testing.assert_allclose(np.asarray(logp[0]), np.asarray(logp2), rtol=1e-3, atol=1e-3)
    assert (np.abs(np.asarray(actions)) <= 1.0).all()
    # default 'pre_tanh' SEARCH prior: bounded — never exceeds the Gaussian
    # mode density (no tanh-jacobian divergence at |a| -> 1)
    _, logp_prior = gaussian_tanh_sample(jax.random.PRNGKey(0), mu, sigma, 6)
    mode = float(np.sum(-np.log(np.asarray(sigma)) - 0.5 * np.log(2 * np.pi)))
    assert float(np.max(np.asarray(logp_prior))) <= mode + 1e-5


def test_sampled_collect_shapes():
    from lightzero_tpu.policy.sampled_muzero import SampledMuZeroPolicy

    cfg = SampledMuZeroPolicy.default_config()
    cfg.model.observation_shape = 3
    cfg.model.action_space_size = 1
    cfg.model.latent_state_dim = 16
    cfg.model.support_scale = 5
    cfg.num_simulations = 6
    cfg.num_of_sampled_actions = 5
    policy = SampledMuZeroPolicy(cfg)
    params = policy.model.init_params(jax.random.PRNGKey(0), batch_size=3)
    out = policy.forward_collect(
        params, jax.random.PRNGKey(1), jnp.ones((3, 3)), jnp.ones((3, 1), bool)
    )
    assert out["action"].shape == (3, 1)
    assert out["visit_counts"].shape == (3, 5)
    assert out["root_sampled_actions"].shape == (3, 5, 1)
    assert int(np.asarray(out["visit_counts"]).sum()) == 18
    assert (np.abs(np.asarray(out["action"])) <= 1.0).all()


def test_sampled_train_smoke(tmp_path):
    from lightzero_tpu.config import Config
    from lightzero_tpu.entry import train_muzero

    cfg = Config(
        dict(
            exp_name=str(tmp_path / "smz_smoke"),
            env=dict(
                env_id="Pendulum-v1",
                stop_value=10_000,
                collector_env_num=2,
                evaluator_env_num=2,
                n_evaluator_episode=2,
            ),
            policy=dict(
                type="sampled_muzero",
                model=dict(
                    observation_shape=3,
                    action_space_size=1,
                    latent_state_dim=16,
                    support_scale=10,
                ),
                num_simulations=4,
                num_of_sampled_actions=4,
                batch_size=8,
                update_per_collect=2,
                n_episode=1,
                eval_freq=1000,
                ssl_loss_weight=2,
            ),
        )
    )
    policy, state, stats = train_muzero(cfg, seed=0, max_env_step=600, max_train_iter=6)
    assert int(state.train_iter) > 0
