"""MoE feed-forward, ViT encoder, and task-embedding conditioning for the
UniZero world model (reference moe.py:20-160, vit.py, transformer.py:70-219
/ world_model_multitask.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightzero_tpu.models.unizero import UniZeroModel
from lightzero_tpu.models.unizero_world_model.moe import MoELayer, SwiGLUFeedForward
from lightzero_tpu.models.vit import ViT

pytestmark = [pytest.mark.unittest, pytest.mark.slow]  # compile-heavy: not in the fast tier


def test_swiglu_shapes():
    ff = SwiGLUFeedForward(16)
    p = ff.init(jax.random.PRNGKey(0), jnp.ones((2, 5, 16)))
    y = ff.apply(p, jnp.ones((2, 5, 16)))
    assert y.shape == (2, 5, 16)


def test_moe_topk_routing_weights():
    moe = MoELayer(8, num_experts=4, num_experts_per_tok=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 7, 8))
    p = moe.init(jax.random.PRNGKey(0), x)
    y = moe.apply(p, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_moe_top1_equals_single_expert_when_one_expert():
    """E=1, k=1 MoE must equal the single expert applied directly."""
    moe = MoELayer(8, num_experts=1, num_experts_per_tok=1)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8))
    p = moe.init(jax.random.PRNGKey(0), x)
    y = moe.apply(p, x)
    ff = SwiGLUFeedForward(8)
    y2 = ff.apply({"params": p["params"]["expert_0"]}, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=1e-5)


def test_vit_encoder_shapes():
    v = ViT(out_dim=32, patch_size=8, dim=32, depth=2, heads=2)
    obs = jnp.ones((2, 32, 32, 3))
    p = v.init(jax.random.PRNGKey(0), obs)
    e = v.apply(p, obs)
    assert e.shape == (2, 32)


def test_unizero_with_moe_and_taskembed_trains():
    m = UniZeroModel(observation_shape=4, action_space_size=2, embed_dim=32,
                     num_heads=4, num_layers=1, max_tokens=16,
                     moe_in_transformer=True, num_experts=2, num_tasks=3)
    params = m.init_params(jax.random.PRNGKey(0), batch_size=2, K=2)
    obs = jnp.ones((2, 3, 4))
    act = jnp.zeros((2, 2), jnp.int32)
    out = m.apply(params, obs, act, jnp.asarray([0, 2]),
                  method=UniZeroModel.train_forward)
    assert out["value_logits"].shape[0] == 2
    # different task ids give different outputs (value/reward heads are
    # zero-init, so compare the obs-prediction head instead)
    out2 = m.apply(params, obs, act, jnp.asarray([1, 1]),
                   method=UniZeroModel.train_forward)
    assert not np.allclose(np.asarray(out["obs_pred"]),
                           np.asarray(out2["obs_pred"]))


def test_unizero_vit_encoder_image():
    m = UniZeroModel(observation_shape=(32, 32, 3), obs_type="image",
                     encoder_type="vit", action_space_size=2, embed_dim=32,
                     num_heads=4, num_layers=1, max_tokens=16)
    params = m.init_params(jax.random.PRNGKey(0), batch_size=2, K=1)
    e = m.apply(params, jnp.ones((2, 32, 32, 3)), method=UniZeroModel.encode_obs)
    assert e.shape == (2, 32)
    np.testing.assert_allclose(np.asarray(e.sum(-1)), 32 / 8, rtol=1e-4)  # SimNorm groups
