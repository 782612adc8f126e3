"""MuZero-Context tests: recursive root latent at collect time
(reference muzero_context_model.py:219-265 semantics)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [pytest.mark.unittest, pytest.mark.slow]  # compile-heavy: not in the fast tier


def _make_policy():
    from lightzero_tpu.policy.muzero_context import MuZeroContextPolicy

    cfg = MuZeroContextPolicy.default_config()
    cfg.model.observation_shape = 4
    cfg.model.action_space_size = 2
    cfg.model.latent_state_dim = 16
    cfg.model.support_scale = 10
    cfg.num_simulations = 4
    cfg.context_length_init = 3
    return MuZeroContextPolicy(cfg)


def test_context_root_latent_semantics():
    """Step 0 re-encodes obs; steps 1..ctx-1 roll dynamics; step ctx re-encodes."""
    from lightzero_tpu.models.muzero import MuZeroModel

    policy = _make_policy()
    params = policy.model.init_params(jax.random.PRNGKey(0), batch_size=2)
    B = 2
    rng = jax.random.PRNGKey(1)
    legal = jnp.ones((B, 2), bool)
    to_play = jnp.full((B,), -1, jnp.int32)
    temp = jnp.asarray(1.0, jnp.float32)
    eps = jnp.asarray(0.0, jnp.float32)

    state = policy.init_collect_state(B)
    assert int(state["last_action"][0]) == -1

    obs0 = jnp.arange(B * 4, dtype=jnp.float32).reshape(B, 4) / 10
    out0, state = policy._forward_collect_stateful(
        params, rng, obs0, legal, to_play, temp, eps, state, deterministic=True
    )
    enc0 = policy.model.apply(params, obs0, method=MuZeroModel.representation)
    np.testing.assert_allclose(np.asarray(state["latent"]), np.asarray(enc0), rtol=1e-5)
    assert int(state["timestep"][0]) == 1

    # step 1: root latent must be dynamics(prev_latent, executed_action), NOT
    # representation(obs1)
    obs1 = obs0 + 1.0
    prev_latent, prev_action = state["latent"], state["last_action"]
    out1, state = policy._forward_collect_stateful(
        params, rng, obs1, legal, to_play, temp, eps, state, deterministic=True
    )
    rolled, _ = policy.model.apply(
        params, prev_latent, prev_action, method=MuZeroModel.dynamics
    )
    np.testing.assert_allclose(np.asarray(state["latent"]), np.asarray(rolled), rtol=1e-5)
    enc1 = policy.model.apply(params, obs1, method=MuZeroModel.representation)
    assert not np.allclose(np.asarray(state["latent"]), np.asarray(enc1))

    # advance to timestep == ctx (3): hard context reset re-encodes the obs
    _, state = policy._forward_collect_stateful(
        params, rng, obs1, legal, to_play, temp, eps, state, deterministic=True
    )
    assert int(state["timestep"][0]) == 3
    obs3 = obs0 - 0.5
    _, state = policy._forward_collect_stateful(
        params, rng, obs3, legal, to_play, temp, eps, state, deterministic=True
    )
    enc3 = policy.model.apply(params, obs3, method=MuZeroModel.representation)
    np.testing.assert_allclose(np.asarray(state["latent"]), np.asarray(enc3), rtol=1e-5)


def test_context_reset_on_done():
    policy = _make_policy()
    state = policy.init_collect_state(3)
    state = dict(
        latent=jnp.ones_like(state["latent"]),
        last_action=jnp.array([1, 0, 1], jnp.int32),
        timestep=jnp.array([4, 7, 2], jnp.int32),
    )
    done = jnp.array([True, False, True])
    state = policy.reset_collect_state(state, done)
    assert state["last_action"].tolist() == [-1, 0, -1]
    assert state["timestep"].tolist() == [0, 7, 0]
    assert float(jnp.abs(state["latent"][0]).sum()) == 0.0
    assert float(jnp.abs(state["latent"][1]).sum()) > 0.0


def test_muzero_context_train_smoke(tmp_path):
    from lightzero_tpu.config import Config
    from lightzero_tpu.entry import train_muzero

    cfg = Config(
        dict(
            exp_name=str(tmp_path / "mzctx_smoke"),
            env=dict(env_id="CartPole-v0", stop_value=10_000, collector_env_num=2,
                     evaluator_env_num=2, n_evaluator_episode=2),
            policy=dict(
                type="muzero_context",
                model=dict(observation_shape=4, action_space_size=2,
                           latent_state_dim=16, support_scale=10),
                num_simulations=4, batch_size=8, update_per_collect=2, n_episode=1,
                eval_freq=1000, context_length_init=4,
            ),
        )
    )
    policy, state, stats = train_muzero(cfg, seed=0, max_env_step=600, max_train_iter=4)
    assert int(state.train_iter) > 0
