"""Sliding inference-context window (reference infer_context_length:
context_length = 2*infer_context_length, zoo/atari/config/
atari_unizero_config.py:61 + trim_and_pad, world_model.py:1506).

With context_window=W, incremental attention must ignore cached tokens
more than W-1 positions behind the query even though they are still
physically present in the ring buffer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightzero_tpu.models.unizero_world_model.transformer import (
    Transformer,
    TransformerConfig,
    init_kv_cache,
)


def _roll_tokens(model, params, cache, tokens):
    """Append tokens one at a time through the incremental path."""
    out = None
    for t in range(tokens.shape[1]):
        x = tokens[:, t : t + 1]
        pos = cache.next_pos[:, None]
        out, cache = model.apply(params, x, pos, cache)
    return out, cache


@pytest.mark.parametrize("window", [4, 6])
def test_window_blinds_old_tokens(window):
    cfg = TransformerConfig(num_layers=1, num_heads=2, embed_dim=16,
                            max_tokens=16, context_window=window)
    model = Transformer(cfg)
    rng = jax.random.PRNGKey(0)
    B, T = 2, 10
    toks_a = jax.random.normal(rng, (B, T, cfg.embed_dim))
    # perturb ONLY the first token — far outside the window by step T.
    # NOTE: the perturbation must NOT be a constant shift: LayerNorm
    # annihilates feature-constant offsets exactly.
    delta = jax.random.normal(jax.random.PRNGKey(9), (cfg.embed_dim,))
    toks_b = toks_a.at[:, 0].add(3.0 * delta)
    params = model.init(jax.random.PRNGKey(1), toks_a[:, :1],
                        jnp.zeros((B, 1), jnp.int32), init_kv_cache(cfg, B))

    out_a, _ = _roll_tokens(model, params, init_kv_cache(cfg, B), toks_a)
    out_b, _ = _roll_tokens(model, params, init_kv_cache(cfg, B), toks_b)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               rtol=1e-5, atol=1e-5)

    # control: perturbing a token INSIDE the window must change the output
    # MORE than the blinded perturbation did (attention at random init gives
    # any single token a small weight, so compare magnitudes, not a fixed
    # tolerance)
    toks_c = toks_a.at[:, T - 2].add(3.0 * delta)
    out_c, _ = _roll_tokens(model, params, init_kv_cache(cfg, B), toks_c)
    blinded = float(np.max(np.abs(np.asarray(out_a) - np.asarray(out_b))))
    control = float(np.max(np.abs(np.asarray(out_a) - np.asarray(out_c))))
    assert control > 50 * max(blinded, 1e-7), (blinded, control)


def test_window_zero_means_full_ring():
    cfg = TransformerConfig(num_layers=1, num_heads=2, embed_dim=16,
                            max_tokens=16, context_window=0)
    model = Transformer(cfg)
    rng = jax.random.PRNGKey(0)
    B, T = 1, 8
    toks_a = jax.random.normal(rng, (B, T, cfg.embed_dim))
    delta = jax.random.normal(jax.random.PRNGKey(9), (cfg.embed_dim,))
    toks_b = toks_a.at[:, 0].add(3.0 * delta)
    params = model.init(jax.random.PRNGKey(1), toks_a[:, :1],
                        jnp.zeros((B, 1), jnp.int32), init_kv_cache(cfg, B))
    out_a, _ = _roll_tokens(model, params, init_kv_cache(cfg, B), toks_a)
    out_b, _ = _roll_tokens(model, params, init_kv_cache(cfg, B), toks_b)
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-4)
