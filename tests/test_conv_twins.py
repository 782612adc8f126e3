"""Conv twins of the sampled/stochastic models (reference
sampled_muzero_model.py, sampled_efficientzero_model.py:1-657,
stochastic_muzero_model.py:1-835): shape/finite checks + one gradient step.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightzero_tpu.models.sampled_efficientzero import SampledEfficientZeroModel
from lightzero_tpu.models.sampled_muzero import SampledMuZeroModel
from lightzero_tpu.models.stochastic_muzero import StochasticMuZeroModel

pytestmark = [pytest.mark.unittest, pytest.mark.slow]  # compile-heavy: not in the fast tier

OBS = (8, 8, 3)  # small NHWC image


def test_sampled_muzero_conv_shapes():
    m = SampledMuZeroModel(observation_shape=OBS, action_space_size=2,
                           model_type="conv", num_channels=16, downsample=False,
                           value_support_size=21, reward_support_size=21)
    params = m.init_params(jax.random.PRNGKey(0), batch_size=2)
    obs = jnp.ones((2,) + OBS)
    out = m.apply(params, obs, method=SampledMuZeroModel.initial_inference)
    assert out["mu"].shape == (2, 2) and out["sigma"].shape == (2, 2)
    assert out["value_logits"].shape == (2, 21)
    assert np.isfinite(np.asarray(out["mu"])).all()
    act = jnp.zeros((2, 2))
    rec = m.apply(params, out["latent_state"], act,
                  method=SampledMuZeroModel.recurrent_inference)
    assert rec["reward_logits"].shape == (2, 21)
    assert rec["latent_state"].shape == out["latent_state"].shape
    assert (np.asarray(jnp.abs(rec["mu"])) <= 1.5 + 1e-6).all()


def test_sampled_efficientzero_conv_shapes():
    m = SampledEfficientZeroModel(observation_shape=OBS, action_space_size=3,
                                  model_type="conv", num_channels=16, downsample=False,
                                  lstm_hidden_size=32,
                                  value_support_size=21, reward_support_size=21)
    params = m.init_params(jax.random.PRNGKey(0), batch_size=2)
    obs = jnp.ones((2,) + OBS)
    out = m.apply(params, obs, method=SampledEfficientZeroModel.initial_inference)
    assert out["mu"].shape == (2, 3)
    rec = m.apply(params, out["latent_state"], out["reward_hidden"], jnp.zeros((2, 3)),
                  method=SampledEfficientZeroModel.recurrent_inference)
    assert rec["value_prefix_logits"].shape == (2, 21)
    assert rec["reward_hidden"][0].shape == (2, 32)
    assert np.isfinite(np.asarray(rec["value_prefix_logits"])).all()


def test_stochastic_muzero_conv_decision_chance():
    m = StochasticMuZeroModel(observation_shape=OBS, action_space_size=4,
                              chance_space_size=8, model_type="conv",
                              num_channels=16, downsample=False,
                              value_support_size=21, reward_support_size=21)
    params = m.init_params(jax.random.PRNGKey(0), batch_size=2)
    obs = jnp.ones((2,) + OBS)
    out = m.apply(params, obs, method=StochasticMuZeroModel.initial_inference)
    assert out.policy_logits.shape == (2, 4)
    act = jnp.zeros((2,), jnp.int32)
    dec = m.apply(params, out.latent_state, act, False,
                  method=StochasticMuZeroModel.recurrent_inference)
    assert dec.policy_logits.shape == (2, 8)  # chance logits at afterstate
    cha = m.apply(params, dec.latent_state, jnp.zeros((2,), jnp.int32), True,
                  method=StochasticMuZeroModel.recurrent_inference)
    assert cha.reward_logits.shape == (2, 21)
    # conv chance encoder over a stacked frame pair
    pair = jnp.concatenate([obs, obs], axis=-1)
    logits, st = m.apply(params, pair, method=StochasticMuZeroModel.chance_encode)
    assert logits.shape == (2, 8)
    np.testing.assert_allclose(np.asarray(st.sum(-1)), 1.0, rtol=1e-5)


def test_conv_twin_gradient_step():
    m = SampledMuZeroModel(observation_shape=OBS, action_space_size=2,
                           model_type="conv", num_channels=16, downsample=False,
                           value_support_size=21, reward_support_size=21)
    params = m.init_params(jax.random.PRNGKey(0), batch_size=2)
    obs = jnp.ones((2,) + OBS)

    def loss(p):
        out = m.apply(p, obs, method=SampledMuZeroModel.initial_inference)
        rec = m.apply(p, out["latent_state"], jnp.zeros((2, 2)),
                      method=SampledMuZeroModel.recurrent_inference)
        # heads are zero-init: target nonzero values so gradients are nonzero
        return jnp.mean((rec["value_logits"] - 1.0) ** 2) + jnp.mean((rec["mu"] - 0.5) ** 2)

    g = jax.grad(loss)(params)
    gn = float(jnp.sqrt(sum(jnp.sum(x ** 2) for x in jax.tree_util.tree_leaves(g))))
    assert np.isfinite(gn) and gn > 0


def test_from_config_auto_conv():
    from lightzero_tpu.config import Config

    cfg = Config(dict(observation_shape=list(OBS), action_space_size=2,
                      value_support_size=21, reward_support_size=21,
                      num_channels=16, downsample=False))
    m = SampledMuZeroModel.from_config(cfg)
    assert m.model_type == "conv"
    m2 = StochasticMuZeroModel.from_config(
        Config(dict(observation_shape=16, action_space_size=4)))
    assert m2.model_type == "mlp"
