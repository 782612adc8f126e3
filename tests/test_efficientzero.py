"""EfficientZero model/policy tests (mirrors reference
lzero/model/tests/test_efficientzero_model.py shape checks + a pipeline
smoke via the shared train entry)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [pytest.mark.unittest, pytest.mark.slow]  # compile-heavy: not in the fast tier


def test_ez_model_shapes():
    from lightzero_tpu.models.efficientzero import EfficientZeroModel

    B, obs_dim, A, L, H = 4, 4, 2, 32, 16
    model = EfficientZeroModel(
        observation_shape=obs_dim,
        action_space_size=A,
        latent_state_dim=L,
        lstm_hidden_size=H,
        value_support_size=21,
        reward_support_size=21,
    )
    params = model.init_params(jax.random.PRNGKey(0), batch_size=B)
    out = model.apply(params, jnp.ones((B, obs_dim)), method=EfficientZeroModel.initial_inference)
    assert out.latent_state.shape == (B, L)
    assert out.reward_hidden[0].shape == (B, H)
    assert np.allclose(np.asarray(out.value_prefix_logits), 0)

    rec = model.apply(
        params,
        out.latent_state,
        out.reward_hidden,
        jnp.zeros((B,), jnp.int32),
        method=EfficientZeroModel.recurrent_inference,
    )
    assert rec.value_prefix_logits.shape == (B, 21)
    assert rec.reward_hidden[0].shape == (B, H)
    # lstm state evolves
    assert not np.allclose(np.asarray(rec.reward_hidden[1]), 0)


def test_ez_search_horizon_reset_semantics():
    """vp_accum/lstm state reset every lstm_horizon_len steps; rewards are
    vp differences (ptree_ez.py:106-113)."""
    from lightzero_tpu.policy.efficientzero import EfficientZeroPolicy

    cfg = EfficientZeroPolicy.default_config()
    cfg.model.latent_state_dim = 16
    cfg.model.lstm_hidden_size = 8
    cfg.model.support_scale = 5
    cfg.num_simulations = 12
    cfg.lstm_horizon_len = 2
    policy = EfficientZeroPolicy(cfg)
    params = policy.model.init_params(jax.random.PRNGKey(0), batch_size=3)
    obs = jnp.ones((3, 4))
    out = policy.forward_collect(params, jax.random.PRNGKey(1), obs, jnp.ones((3, 2), bool))
    assert out["action"].shape == (3,)
    assert int(out["visit_counts"].sum()) == 12 * 3


def test_ez_train_smoke(tmp_path):
    from lightzero_tpu.config import Config
    from lightzero_tpu.entry import train_muzero

    cfg = Config(
        dict(
            exp_name=str(tmp_path / "ez_smoke"),
            env=dict(
                env_id="CartPole-v0",
                stop_value=10_000,
                collector_env_num=2,
                evaluator_env_num=2,
                n_evaluator_episode=2,
            ),
            policy=dict(
                type="efficientzero",
                model=dict(
                    observation_shape=4,
                    action_space_size=2,
                    model_type="mlp",
                    latent_state_dim=16,
                    lstm_hidden_size=16,
                    support_scale=10,
                ),
                num_simulations=4,
                batch_size=8,
                update_per_collect=2,
                n_episode=1,
                eval_freq=1000,
                lstm_horizon_len=3,
            ),
        )
    )
    policy, state, stats = train_muzero(cfg, seed=0, max_env_step=700, max_train_iter=6)
    assert int(state.train_iter) > 0
