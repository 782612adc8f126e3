"""MuZero-RNN-full-obs tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [pytest.mark.unittest, pytest.mark.slow]  # compile-heavy: not in the fast tier


def test_muzero_rnn_collect_and_learn(tmp_path):
    from lightzero_tpu.config import Config
    from lightzero_tpu.entry import train_muzero

    cfg = Config(
        dict(
            exp_name=str(tmp_path / "mzrnn_smoke"),
            env=dict(env_id="CartPole-v0", stop_value=10_000, collector_env_num=2,
                     evaluator_env_num=2, n_evaluator_episode=2),
            policy=dict(
                type="muzero_rnn_full_obs",
                model=dict(observation_shape=4, action_space_size=2,
                           latent_state_dim=16, rnn_hidden_size=16, support_scale=10),
                num_simulations=4, batch_size=8, update_per_collect=2, n_episode=1,
                eval_freq=1000, ssl_loss_weight=2,
            ),
        )
    )
    policy, state, stats = train_muzero(cfg, seed=0, max_env_step=600, max_train_iter=4)
    assert int(state.train_iter) > 0


def test_muzero_rnn_history_evolves():
    from lightzero_tpu.models.muzero_rnn import MuZeroRNNModel

    model = MuZeroRNNModel(observation_shape=4, action_space_size=2,
                           latent_state_dim=16, rnn_hidden_size=8,
                           value_support_size=21, reward_support_size=21)
    params = model.init_params(jax.random.PRNGKey(0), batch_size=3)
    out = model.apply(params, jnp.ones((3, 4)), method=MuZeroRNNModel.initial_inference)
    assert np.allclose(np.asarray(out["history"]), 0)
    rec = model.apply(params, out["latent_state"], out["history"], jnp.zeros((3,), jnp.int32),
                      method=MuZeroRNNModel.recurrent_inference)
    assert not np.allclose(np.asarray(rec["history"]), 0)
