"""Pallas fused-traverse kernel parity vs the XLA `_traverse`
(search/pallas_traverse.py, interpret mode on CPU): the SAME search with
use_pallas_traverse on/off must produce identical trees."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightzero_tpu.search import batch_puct_search
from lightzero_tpu.search.types import RecurrentOutput, RootOutput, SearchConfig

pytestmark = pytest.mark.unittest

B, A, SIMS = 8, 5, 12


def _dummy_recurrent(params, rng, action, embedding):
    # deterministic, action-dependent dynamics over a (B, 4) latent
    latent = embedding["latent"]
    a = action.astype(jnp.float32)[:, None]
    new_latent = jnp.tanh(latent * 0.9 + a * 0.13 + 0.05)
    value = jnp.tanh(new_latent.sum(axis=-1))
    reward = 0.1 * jnp.cos(new_latent.mean(axis=-1) * 3.0)
    prior = jnp.sin(new_latent @ jnp.arange(1.0, 5.0)[:, None] * jnp.arange(1.0, A + 1.0)[None, :])
    return RecurrentOutput(
        prior_logits=prior,
        value=value,
        reward=reward,
        embedding={"latent": new_latent},
    )


def _run(cfg, seed=0):
    rng = jax.random.PRNGKey(seed)
    pr_rng, v_rng, s_rng = jax.random.split(rng, 3)
    root = RootOutput(
        prior_logits=jax.random.normal(pr_rng, (B, A)),
        value=jax.random.uniform(v_rng, (B,), minval=-1.0, maxval=1.0),
        embedding={"latent": jax.random.normal(jax.random.PRNGKey(7), (B, 4))},
    )
    legal = jnp.ones((B, A), bool).at[0, 3].set(False).at[2, 0].set(False)
    out = batch_puct_search(
        None, s_rng, root, _dummy_recurrent, cfg, legal,
        to_play=jnp.full((B,), -1, jnp.int32),
    )
    return out


@pytest.mark.parametrize("tie_break", ["first", "noise"])
def test_pallas_traverse_exact_parity(tie_break):
    base = SearchConfig(num_simulations=SIMS, players=1, tie_break=tie_break,
                        root_noise_weight=0.0)
    ref = _run(base)
    pal = _run(dataclasses.replace(base, use_pallas_traverse=True))
    np.testing.assert_array_equal(
        np.asarray(ref.visit_counts), np.asarray(pal.visit_counts),
        err_msg="pallas traverse changed the search's visit counts",
    )
    np.testing.assert_allclose(
        np.asarray(ref.root_value), np.asarray(pal.root_value), rtol=1e-5, atol=1e-6,
    )


def test_pallas_gate_falls_back_for_two_player():
    # players==2 must silently use the XLA path (no error, same results)
    cfg2 = SearchConfig(num_simulations=6, players=2, tie_break="first",
                        root_noise_weight=0.0)
    ref = _run(cfg2)
    pal = _run(dataclasses.replace(cfg2, use_pallas_traverse=True))
    np.testing.assert_array_equal(np.asarray(ref.visit_counts), np.asarray(pal.visit_counts))
