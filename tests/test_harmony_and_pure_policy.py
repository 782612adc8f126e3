"""HarmonyDream learnable loss weights (reference muzero.py:325-331,563-575)
and collect_with_pure_policy (muzero.py:800-812)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightzero_tpu.policy import MuZeroPolicy

pytestmark = [pytest.mark.unittest, pytest.mark.slow]  # compile-heavy: not in the fast tier


def _cfg(**over):
    cfg = MuZeroPolicy.default_config()
    cfg.model.observation_shape = 4
    cfg.model.action_space_size = 2
    cfg.model.latent_state_dim = 16
    cfg.model.support_scale = 25
    cfg.num_simulations = 4
    cfg.num_unroll_steps = 2
    cfg.td_steps = 2
    cfg.batch_size = 4
    for k, v in over.items():
        if k.startswith("model_"):
            setattr(cfg.model, k[6:], v)
        else:
            setattr(cfg, k, v)
    return cfg


def _batch(policy, B=4):
    from lightzero_tpu.policy.muzero import TrainBatch

    K = policy.num_unroll_steps
    rng = np.random.RandomState(0)
    return TrainBatch(
        obs=jnp.asarray(rng.randn(B, K + 1, 4), jnp.float32),
        actions=jnp.asarray(rng.randint(0, 2, (B, K)), jnp.int32),
        mask=jnp.ones((B, K), jnp.float32),
        target_reward=jnp.asarray(rng.randn(B, K), jnp.float32),
        target_value=jnp.asarray(rng.randn(B, K + 1), jnp.float32),
        target_policy=jnp.full((B, K + 1, 2), 0.5, jnp.float32),
        weights=jnp.ones((B,), jnp.float32),
    )


def test_harmony_params_exist_and_update():
    policy = MuZeroPolicy(_cfg(model_harmony_balance=True))
    state = policy.init_train_state(jax.random.PRNGKey(0))
    assert "harmony_policy" in state.params["params"]
    h0 = float(state.params["params"]["harmony_value"])
    batch = _batch(policy)
    for _ in range(3):
        state, logs, _ = policy.forward_learn(state, batch)
    h1 = float(state.params["params"]["harmony_value"])
    assert h1 != h0
    assert np.isfinite(float(logs["total_loss"]))


def test_harmony_off_has_no_params():
    policy = MuZeroPolicy(_cfg())
    state = policy.init_train_state(jax.random.PRNGKey(0))
    assert "harmony_policy" not in state.params["params"]


def test_collect_with_pure_policy():
    policy = MuZeroPolicy(_cfg(collect_with_pure_policy=True))
    state = policy.init_train_state(jax.random.PRNGKey(0))
    B = 6
    obs = jnp.asarray(np.random.RandomState(1).randn(B, 4), jnp.float32)
    legal = jnp.ones((B, 2), bool).at[0, 1].set(False)
    out = policy.forward_collect(state.params, jax.random.PRNGKey(2), obs, legal)
    assert out["action"].shape == (B,)
    # masked action never selected
    assert int(out["action"][0]) == 0
    # "visit_counts" are the softmax policy probs in pure-policy mode
    np.testing.assert_allclose(np.asarray(out["visit_counts"].sum(-1)), 1.0, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["searched_value"]), np.asarray(out["predicted_value"]), rtol=1e-6
    )
