"""Gumbel MuZero search tests: sequential-halving schedule golden vs the
reference C++ logic (reimplemented spec), behavioral checks of root
selection and improved policy."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [pytest.mark.unittest, pytest.mark.slow]  # compile-heavy: not in the fast tier


def test_visit_sequence_matches_reference_spec():
    """Spot-check the schedule against hand-derived values of the reference
    algorithm (get_sequence_of_considered_visits, gumbel cnode.cpp)."""
    from lightzero_tpu.search.gumbel import sequence_of_considered_visits

    # m=4, n=16: log2max=2, phase1: extra=16//(2*4)=2 -> [0,0,0,0,1,1,1,1];
    # then m=2: extra=16//(2*2)=4 -> [2,2,3,3,4,4,5,5]
    seq = sequence_of_considered_visits(4, 16).tolist()
    assert seq == [0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5]
    # m<=1: 0..n-1
    assert sequence_of_considered_visits(1, 5).tolist() == [0, 1, 2, 3, 4]
    # length always n
    for m in (2, 3, 5, 8, 16):
        assert len(sequence_of_considered_visits(m, 50)) == 50


def _toy_search(reward_for_action, num_sims=32, A=4, B=2, max_considered=4):
    from lightzero_tpu.search import RecurrentOutput, RootOutput
    from lightzero_tpu.search.gumbel import GumbelSearchConfig, batch_gumbel_search

    def recurrent_fn(params, rng, action, emb):
        nl = emb + 1.0
        reward = jnp.asarray(reward_for_action)[action]
        return RecurrentOutput(
            reward=reward,
            value=jnp.zeros_like(nl),
            prior_logits=jnp.zeros((action.shape[0], A)),
            embedding=nl,
        )

    root = RootOutput(
        prior_logits=jnp.zeros((B, A)),
        value=jnp.zeros((B,)),
        embedding=jnp.zeros((B,)),
    )
    cfg = GumbelSearchConfig(num_simulations=num_sims, max_num_considered_actions=max_considered)
    return batch_gumbel_search(
        None, jax.random.PRNGKey(0), root, recurrent_fn, cfg, jnp.ones((B, A), bool)
    )


def test_gumbel_search_finds_rewarding_action():
    out = _toy_search([0.0, 0.0, 1.0, 0.0])
    ip = np.asarray(out.improved_policy)
    assert (ip.argmax(-1) == 2).all(), ip
    # improved policy is a distribution
    np.testing.assert_allclose(ip.sum(-1), 1.0, rtol=1e-5)
    # visit counts sum to num_simulations
    np.testing.assert_array_equal(np.asarray(out.visit_counts).sum(-1), 32)


def test_gumbel_respects_legal_mask():
    from lightzero_tpu.search import RecurrentOutput, RootOutput
    from lightzero_tpu.search.gumbel import GumbelSearchConfig, batch_gumbel_search

    A, B = 5, 3

    def recurrent_fn(params, rng, action, emb):
        return RecurrentOutput(
            reward=jnp.ones_like(emb),
            value=jnp.zeros_like(emb),
            prior_logits=jnp.zeros((B, A)),
            embedding=emb + 1,
        )

    legal = jnp.asarray([[True, False, True, False, True]] * B)
    root = RootOutput(jnp.zeros((B, A)), jnp.zeros((B,)), jnp.zeros((B,)))
    out = batch_gumbel_search(
        None,
        jax.random.PRNGKey(3),
        root,
        recurrent_fn,
        GumbelSearchConfig(num_simulations=20, max_num_considered_actions=8),
        legal,
    )
    vc = np.asarray(out.visit_counts)
    assert (vc[:, [1, 3]] == 0).all()
    ip = np.asarray(out.improved_policy)
    assert (ip[:, [1, 3]] == 0).all()


def test_gumbel_policy_collect():
    from lightzero_tpu.policy.gumbel_muzero import GumbelMuZeroPolicy

    cfg = GumbelMuZeroPolicy.default_config()
    cfg.model.latent_state_dim = 16
    cfg.model.support_scale = 5
    cfg.num_simulations = 8
    cfg.max_num_considered_actions = 2
    policy = GumbelMuZeroPolicy(cfg)
    params = policy.model.init_params(jax.random.PRNGKey(0), batch_size=3)
    out = policy.forward_collect(
        params, jax.random.PRNGKey(1), jnp.ones((3, 4)), jnp.ones((3, 2), bool)
    )
    assert out["action"].shape == (3,)
    np.testing.assert_allclose(np.asarray(out["visit_counts"]).sum(-1), 1.0, rtol=1e-5)
