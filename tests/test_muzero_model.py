"""Shape tests for the MuZero flax model (mirrors reference
lzero/model/tests/test_muzero_model.py forward-shape checks)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightzero_tpu.models import MuZeroModel

pytestmark = [pytest.mark.unittest, pytest.mark.slow]  # compile-heavy: not in the fast tier


@pytest.mark.parametrize("ssl", [False, True])
def test_mlp_model_shapes(ssl):
    B, obs_dim, A, L = 6, 4, 2, 64
    model = MuZeroModel(
        observation_shape=obs_dim,
        action_space_size=A,
        model_type="mlp",
        latent_state_dim=L,
        value_support_size=21,
        reward_support_size=21,
        self_supervised_learning_loss=ssl,
    )
    params = model.init_params(jax.random.PRNGKey(0), batch_size=B)
    obs = jnp.ones((B, obs_dim))
    out = model.apply(params, obs, method=MuZeroModel.initial_inference)
    assert out.latent_state.shape == (B, L)
    assert out.value_logits.shape == (B, 21)
    assert out.policy_logits.shape == (B, A)
    assert np.allclose(np.asarray(out.reward_logits), 0)

    action = jnp.zeros((B,), jnp.int32)
    rec = model.apply(params, out.latent_state, action, method=MuZeroModel.recurrent_inference)
    assert rec.latent_state.shape == (B, L)
    assert rec.reward_logits.shape == (B, 21)

    if ssl:
        p1 = model.apply(params, rec.latent_state, True, method=MuZeroModel.project)
        p2 = model.apply(params, rec.latent_state, False, method=MuZeroModel.project)
        assert p1.shape == (B, 1024) and p2.shape == (B, 1024)


def test_conv_model_shapes():
    B, A = 2, 6
    H = W = 96
    C = 4 * 3  # frame_stack * rgb  (reference atari stacked obs)
    model = MuZeroModel(
        observation_shape=(H, W, C),
        action_space_size=A,
        model_type="conv",
        num_channels=32,
        num_res_blocks=1,
        value_support_size=21,
        reward_support_size=21,
        downsample=True,
    )
    params = model.init_params(jax.random.PRNGKey(0), batch_size=B)
    obs = jnp.ones((B, H, W, C))
    out = model.apply(params, obs, method=MuZeroModel.initial_inference)
    assert out.latent_state.shape == (B, 6, 6, 32)  # 96/16 = 6 downsample
    assert out.value_logits.shape == (B, 21)
    assert out.policy_logits.shape == (B, A)
    rec = model.apply(
        params, out.latent_state, jnp.ones((B,), jnp.int32), method=MuZeroModel.recurrent_inference
    )
    assert rec.latent_state.shape == (B, 6, 6, 32)
    assert rec.reward_logits.shape == (B, 21)


def test_from_config():
    from lightzero_tpu.config import Config

    cfg = Config(
        dict(
            observation_shape=8,
            action_space_size=4,
            model_type="mlp",
            latent_state_dim=32,
            self_supervised_learning_loss=True,
        )
    )
    model = MuZeroModel.from_config(cfg)
    params = model.init_params(jax.random.PRNGKey(1))
    out = model.apply(params, jnp.ones((3, 8)), method=MuZeroModel.initial_inference)
    assert out.latent_state.shape == (3, 32)
