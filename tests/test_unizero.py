"""UniZero transformer world model + policy tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [pytest.mark.unittest, pytest.mark.slow]  # compile-heavy: not in the fast tier


def test_transformer_cache_matches_full_forward():
    """Incremental ring-buffer inference must equal the full-sequence
    forward (the cache-correctness property the reference asserts via its
    kv_caching tests)."""
    from lightzero_tpu.models.unizero_world_model.transformer import (
        Transformer,
        TransformerConfig,
        init_kv_cache,
    )

    cfg = TransformerConfig(num_layers=2, num_heads=4, embed_dim=32, max_tokens=16)
    model = Transformer(cfg)
    B, T = 2, 6
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, T, 32))
    pos = jnp.broadcast_to(jnp.arange(T), (B, T))
    params = model.init(jax.random.PRNGKey(1), x, pos, None)
    full, _ = model.apply(params, x, pos, None)

    cache = init_kv_cache(cfg, B)
    outs = []
    for t in range(T):
        out, cache = model.apply(params, x[:, t : t + 1], pos[:, t : t + 1], cache)
        outs.append(out[:, 0])
    inc = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(inc), rtol=2e-4, atol=2e-4)


def test_ring_buffer_sliding_window():
    """Past capacity, old tokens are overwritten (sliding context)."""
    from lightzero_tpu.models.unizero_world_model.transformer import (
        Transformer,
        TransformerConfig,
        init_kv_cache,
    )

    cfg = TransformerConfig(num_layers=1, num_heads=2, embed_dim=16, max_tokens=4)
    model = Transformer(cfg)
    B = 1
    x0 = jnp.ones((B, 1, 16))
    params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((B, 1), jnp.int32), None)
    cache = init_kv_cache(cfg, B)
    for t in range(6):
        _, cache = model.apply(
            params, x0 * (t + 1), jnp.full((B, 1), t, jnp.int32), cache
        )
    # capacity 4: slots hold positions 4,5,2,3
    assert sorted(np.asarray(cache.pos[0]).tolist()) == [2, 3, 4, 5]
    assert int(cache.next_pos[0]) == 6


def test_unizero_model_train_forward_shapes():
    from lightzero_tpu.models.unizero import UniZeroModel

    model = UniZeroModel(
        observation_shape=4,
        action_space_size=2,
        embed_dim=64,
        num_layers=1,
        num_heads=4,
        max_tokens=16,
        value_support_size=21,
        reward_support_size=21,
    )
    B, K = 3, 5
    params = model.init_params(jax.random.PRNGKey(0), batch_size=B, K=K)
    out = model.apply(
        params,
        jnp.ones((B, K + 1, 4)),
        jnp.zeros((B, K), jnp.int32),
        method=UniZeroModel.train_forward,
    )
    assert out["value_logits"].shape == (B, K + 1, 21)
    assert out["policy_logits"].shape == (B, K + 1, 2)
    assert out["reward_logits"].shape == (B, K, 21)
    assert out["obs_pred"].shape == (B, K, 64)
    # SimNorm: each 8-chunk sums to 1
    chunks = np.asarray(out["obs_embeddings"]).reshape(B, K + 1, -1, 8)
    np.testing.assert_allclose(chunks.sum(-1), 1.0, rtol=1e-4)


def test_unizero_train_smoke(tmp_path):
    from lightzero_tpu.config import Config
    from lightzero_tpu.entry import train_unizero

    cfg = Config(
        dict(
            exp_name=str(tmp_path / "uz_smoke"),
            env=dict(
                env_id="CartPole-v0",
                stop_value=10_000,
                collector_env_num=2,
                evaluator_env_num=2,
                n_evaluator_episode=2,
            ),
            policy=dict(
                type="unizero",
                model=dict(
                    observation_shape=4,
                    action_space_size=2,
                    embed_dim=32,
                    num_layers=1,
                    num_heads=4,
                    max_tokens=16,
                    support_scale=10,
                ),
                num_simulations=4,
                num_unroll_steps=4,
                batch_size=8,
                update_per_collect=2,
                n_episode=1,
                eval_freq=1000,
            ),
        )
    )
    policy, state, stats = train_unizero(cfg, seed=0, max_env_step=600, max_train_iter=6)
    assert int(state.train_iter) > 0
