"""CurriculumLoRA (reference CurriculumLoRALinear, transformer.py:70-219):
staged adapters, trainability masks, and stage switching on the policy."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightzero_tpu.models.unizero import UniZeroModel
from lightzero_tpu.models.unizero_world_model.transformer import (
    curriculum_trainable_mask,
)
from lightzero_tpu.policy.unizero import UniZeroPolicy

pytestmark = [pytest.mark.unittest, pytest.mark.slow]  # compile-heavy: not in the fast tier


def _model(stage=0):
    return UniZeroModel(observation_shape=4, action_space_size=2, embed_dim=32,
                        num_heads=4, num_layers=1, max_tokens=16,
                        lora_r=4, curriculum_stage_num=3, curriculum_stage=stage)


def test_lora_params_exist_and_zero_init_is_identity():
    m0 = _model(stage=0)
    params = m0.init_params(jax.random.PRNGKey(0), batch_size=2, K=2)
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = {"/".join(str(k.key) for k in path) for path, _ in flat}
    assert any("lora_A_1" in n for n in names)
    assert any("lora_B_2" in n for n in names)
    obs = jnp.ones((2, 3, 4))
    act = jnp.zeros((2, 2), jnp.int32)
    out0 = m0.apply(params, obs, act, method=UniZeroModel.train_forward)
    # B adapters are zero-init and scales start at exactly 1.0, so stage 2
    # output equals stage 0 output at init
    import dataclasses

    m2 = dataclasses.replace(m0, curriculum_stage=2)
    out2 = m2.apply(params, obs, act, method=UniZeroModel.train_forward)
    np.testing.assert_allclose(np.asarray(out0["value_logits"]),
                               np.asarray(out2["value_logits"]), rtol=1e-6)


def test_trainable_mask_stage_semantics():
    m = _model()
    params = m.init_params(jax.random.PRNGKey(0), batch_size=2, K=2)

    def lookup(mask, pred):
        hits = []
        for path, leaf in jax.tree_util.tree_leaves_with_path(mask):
            name = "/".join(str(k.key) for k in path)
            if pred(name):
                hits.append(leaf)
        return hits

    m0 = curriculum_trainable_mask(params, 0)
    assert all(lookup(m0, lambda n: "lora_A_1" in n)) is False or not any(
        lookup(m0, lambda n: "lora_A_1" in n)
    )
    # base transformer kernels trainable at stage 0
    assert all(lookup(m0, lambda n: "_wm" in n and "kernel" in n and "lora" not in n))

    m1 = curriculum_trainable_mask(params, 1)
    assert all(lookup(m1, lambda n: "lora_A_1" in n or "lora_B_1" in n))
    assert not any(lookup(m1, lambda n: "lora_A_2" in n))
    # transformer base frozen at stage >= 1
    assert not any(lookup(m1, lambda n: "_wm" in n and "base/kernel" in n))
    # encoder/heads stay trainable
    assert all(lookup(m1, lambda n: "_enc" in n))

    m2 = curriculum_trainable_mask(params, 2)
    assert all(lookup(m2, lambda n: "lora_A_2" in n))
    # earlier adapter weights frozen, their scales trainable
    assert not any(lookup(m2, lambda n: "lora_A_1" in n))
    assert all(lookup(m2, lambda n: "adapter_scale_1" in n))
    assert not any(lookup(m2, lambda n: "adapter_scale_2" in n))


def test_stage_switch_trains_only_adapters():
    cfg = UniZeroPolicy.default_config()
    cfg.model.observation_shape = 4
    cfg.model.action_space_size = 2
    cfg.model.embed_dim = 32
    cfg.model.num_heads = 4
    cfg.model.num_layers = 1
    cfg.model.max_tokens = 16
    cfg.model.support_scale = 25
    cfg.model.lora_r = 4
    cfg.model.curriculum_stage_num = 2
    cfg.num_unroll_steps = 2
    cfg.num_simulations = 4
    cfg.batch_size = 4
    cfg.use_adaptive_entropy_weight = False
    policy = UniZeroPolicy(cfg)
    state = policy.init_train_state(jax.random.PRNGKey(0))

    policy.set_curriculum_stage(1)
    state = state._replace(opt_state=policy.optimizer.init(state.params))

    from tests_helpers_buffers import fake_episode  # noqa: F401
    from lightzero_tpu.policy.muzero import TrainBatch

    rng = np.random.RandomState(0)
    K = 2
    batch = TrainBatch(
        obs=jnp.asarray(rng.randn(4, K + 1, 4), jnp.float32),
        actions=jnp.asarray(rng.randint(0, 2, (4, K)), jnp.int32),
        mask=jnp.ones((4, K), jnp.float32),
        target_reward=jnp.asarray(rng.randn(4, K), jnp.float32),
        target_value=jnp.asarray(rng.randn(4, K + 1), jnp.float32),
        target_policy=jnp.full((4, K + 1, 2), 0.5, jnp.float32),
        weights=jnp.ones((4,), jnp.float32),
    )
    def leaf_map(params):
        return {
            "/".join(str(k.key) for k in path): np.asarray(leaf).copy()
            for path, leaf in jax.tree_util.tree_leaves_with_path(params)
        }

    # snapshot BEFORE the call: forward_learn donates the state buffers
    b = leaf_map(state.params)
    state2, logs, _ = policy.forward_learn(state, batch)
    a = leaf_map(state2.params)
    changed = {n for n in b if not np.allclose(b[n], a[n])}
    # transformer base kernels must NOT change; adapter 1 must change
    assert not any("base/kernel" in n and "_wm" in n for n in changed), changed
    assert any("lora_A_1" in n or "lora_B_1" in n for n in changed), changed
