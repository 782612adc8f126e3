"""Discrete sampled MuZero/EfficientZero (reference
continuous_action_space=False branch, lzero/policy/sampled_muzero.py:694
_calculate_policy_loss_disc + lzero/mcts/ptree/ptree_sez.py:126-139
multinomial-without-replacement expansion).

Covers:
- sample_discrete_actions properties (distinct, legal-masked, exact logp);
- 2-iteration train steps for both discrete sampled policies (fast tier);
- a micro fused-search collect with a legal mask;
- GOLDEN visit-count parity vs the reference ptree_sez in DISCRETE mode,
  with both sides sampling candidates by the same deterministic top-K rule
  (the same pattern as tests/test_sampled_search_golden.py for continuous).
"""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import has_reference, load_reference_module

pytestmark = pytest.mark.unittest


def test_sample_discrete_actions_properties():
    from lightzero_tpu.policy.sampled_muzero import sample_discrete_actions

    B, A, K = 64, 7, 4
    rng = jax.random.PRNGKey(0)
    logits = jax.random.normal(jax.random.PRNGKey(1), (B, A))
    legal = jnp.ones((B, A), bool).at[:, 5].set(False)
    acts, logp = sample_discrete_actions(rng, logits, K, legal_mask=legal)
    acts_np, logp_np = np.asarray(acts), np.asarray(logp)
    # distinct within each row (without replacement, ptree_sez.py:134)
    for b in range(B):
        assert len(set(acts_np[b].tolist())) == K
    # never samples the masked action
    assert not (acts_np == 5).any()
    # logp is exactly log softmax over the masked space at the sampled ids
    masked = np.where(np.asarray(legal), np.asarray(logits), -1e9)
    ls = masked - np.log(np.exp(masked - masked.max(-1, keepdims=True)).sum(-1, keepdims=True)) - masked.max(-1, keepdims=True)
    np.testing.assert_allclose(
        logp_np, np.take_along_axis(ls, acts_np, axis=-1), rtol=1e-5, atol=1e-5
    )


def _tiny(cfg, **model_kw):
    cfg.num_unroll_steps = 2
    cfg.td_steps = 2
    cfg.num_simulations = 3
    cfg.batch_size = 4
    for k, v in model_kw.items():
        cfg.model[k] = v
    return cfg


def test_discrete_sampled_train_steps():
    """2-iteration jitted _forward_learn for discrete sampled MZ + EZ."""
    from lightzero_tpu.policy.muzero import TrainBatch
    from lightzero_tpu.policy.sampled_efficientzero import SampledEfficientZeroPolicy
    from lightzero_tpu.policy.sampled_muzero import SampledMuZeroPolicy, SampledTrainBatch

    B, K, Ks, A = 4, 2, 3, 5
    base = TrainBatch(
        obs=jnp.ones((B, K + 1, 4), jnp.float32),
        actions=jnp.zeros((B, K), jnp.int32),
        mask=jnp.ones((B, K), jnp.float32),
        target_reward=jnp.full((B, K), 0.5, jnp.float32),
        target_value=jnp.ones((B, K + 1), jnp.float32),
        target_policy=jnp.full((B, K + 1, Ks), 1.0 / Ks, jnp.float32),
        weights=jnp.ones((B,), jnp.float32),
        chance=None,
    )
    # collector stores sampled ids as float (B, K+1, Ks)
    sampled = jnp.tile(jnp.asarray([0.0, 2.0, 4.0]), (B, K + 1, 1))
    for cls, kw in [
        (SampledMuZeroPolicy, {}),
        (SampledEfficientZeroPolicy, dict(lstm_hidden_size=16)),
    ]:
        cfg = _tiny(cls.default_config(), observation_shape=4,
                    action_space_size=A, latent_state_dim=8, support_scale=5,
                    continuous_action_space=False, **kw)
        cfg.num_of_sampled_actions = Ks
        policy = cls(cfg)
        assert policy.discrete
        state = policy.init_train_state(jax.random.PRNGKey(0))
        step = jax.jit(policy._forward_learn)
        batch = SampledTrainBatch(base=base, sampled_actions=sampled)
        for _ in range(2):
            state, logs, _ = step(state, batch)
        assert np.isfinite(float(logs["total_loss"]))


def test_discrete_sampled_collect():
    """Micro fused-search collect: int actions, legal mask respected."""
    from lightzero_tpu.policy.sampled_muzero import SampledMuZeroPolicy

    B, A, Ks = 2, 5, 3
    cfg = _tiny(SampledMuZeroPolicy.default_config(), observation_shape=4,
                action_space_size=A, latent_state_dim=8, support_scale=5,
                continuous_action_space=False)
    cfg.num_of_sampled_actions = Ks
    policy = SampledMuZeroPolicy(cfg)
    params = policy.model.init_params(jax.random.PRNGKey(0), batch_size=B)
    legal = jnp.ones((B, A), bool).at[:, 0].set(False)
    out = jax.jit(policy._forward_collect)(
        params, jax.random.PRNGKey(1),
        jnp.ones((B, 4), jnp.float32), legal,
        jnp.full((B,), -1, jnp.int32),
        jnp.asarray(1.0, jnp.float32), jnp.asarray(0.0, jnp.float32),
    )
    acts = np.asarray(out["action"])
    rsa = np.asarray(out["root_sampled_actions"])
    vc = np.asarray(out["visit_counts"])
    assert acts.dtype.kind == "i" and ((acts >= 1) & (acts < A)).all()
    assert rsa.shape == (B, Ks) and not (rsa == 0).any()  # mask respected
    assert vc.shape == (B, Ks) and vc.sum(-1).min() >= cfg.num_simulations


# ---------------------- golden parity vs reference ptree_sez ---------------

A_G = 5   # action space size
K_G = 3   # num_of_sampled_actions


def fake_logits(latent):
    """(B,) latent -> (B, A_G) deterministic, tie-free logits."""
    latent = np.asarray(latent, np.float64)
    a = np.arange(A_G, dtype=np.float64)
    return np.sin(latent[:, None] * (a + 1.3) + 0.7 * a)


def fake_next_latent(latent, action):
    return np.tanh(np.asarray(latent, np.float64) * 1.1
                   + 0.3 * (np.asarray(action, np.float64) - 2.0))


def fake_reward(latent):
    return 0.3 * np.sin(3.0 * latent)


def fake_value(latent):
    return 0.5 * np.cos(2.0 * latent)


def run_reference_disc(obs, num_simulations, discount):
    import torch

    minimax = load_reference_module("lzero/mcts/ptree/minimax.py")
    ptree = load_reference_module("lzero/mcts/ptree/ptree_sez.py")
    ptree.random.choice = lambda lst: lst[0]  # tie_break='first'
    torch.set_default_dtype(torch.float64)

    # deterministic stand-in for multinomial(prob, K, replacement=False):
    # top-K by probability (both sides use the same rule)
    orig_multinomial = torch.multinomial
    torch.multinomial = lambda prob, k, replacement=False: torch.topk(prob, k).indices
    try:
        B = len(obs)
        roots = ptree.Roots(B, [list(range(A_G)) for _ in range(B)],
                            action_space_size=A_G,
                            num_of_sampled_actions=K_G,
                            continuous_action_space=False)
        latent0 = np.asarray(obs, np.float64)
        policies0 = [list(map(float, row)) for row in fake_logits(latent0)]
        roots.prepare_no_noise([0.0] * B, policies0, [-1] * B)

        stats_lst = minimax.MinMaxStatsList(B)
        stats_lst.set_delta(0.01)

        latent_pool = [latent0]
        vp_pool = [np.zeros(B)]
        for sim in range(num_simulations):
            results = ptree.SearchResults(num=B)
            idx_path, idx_batch, last_actions, vtp = ptree.batch_traverse(
                roots, 19652, 1.25, discount, stats_lst, results, [-1] * B,
                continuous_action_space=False,
            )
            parent_latent = np.array(
                [latent_pool[idx_path[i]][idx_batch[i]] for i in range(B)], np.float64
            )
            parent_vp = np.array(
                [vp_pool[idx_path[i]][idx_batch[i]] for i in range(B)], np.float64
            )
            actions = np.asarray(
                [int(np.asarray(a).reshape(-1)[0]) for a in last_actions], np.int64
            )
            nl = fake_next_latent(parent_latent, actions)
            vp = parent_vp + fake_reward(nl)
            latent_pool.append(nl)
            vp_pool.append(vp)
            policies = [list(map(float, row)) for row in fake_logits(nl)]
            ptree.batch_backpropagate(
                sim + 1, discount, list(vp), list(fake_value(nl)), policies,
                stats_lst, results, [0] * B, [-1] * B,
            )
        return (
            np.array([d for d in roots.get_distributions()], dtype=np.int64),
            np.asarray(roots.get_values(), np.float64),
            [np.asarray([int(np.asarray(a.value).reshape(-1)[0]) for a in sa])
             for sa in roots.get_sampled_actions()],
        )
    finally:
        torch.multinomial = orig_multinomial
        torch.set_default_dtype(torch.float32)


def run_jax_disc(obs, num_simulations, discount):
    with jax.enable_x64(True):
        from lightzero_tpu.search import (
            RecurrentOutput, RootOutput, SearchConfig, batch_puct_search,
        )

        B = len(obs)
        a_grid = jnp.arange(A_G, dtype=jnp.float64)

        def logits_of(latent):
            return jnp.sin(latent[:, None] * (a_grid + 1.3) + 0.7 * a_grid)

        def det_topk(logits):
            _, acts = jax.lax.top_k(logits, K_G)
            logp = jax.nn.log_softmax(logits, axis=-1)
            return acts, jnp.take_along_axis(logp, acts, axis=-1)

        def recurrent_fn(params, rng, slot, emb):
            bidx = jnp.arange(B)
            action = emb["sampled"][bidx, slot]
            nl = jnp.tanh(emb["latent"] * 1.1 + 0.3 * (action.astype(jnp.float64) - 2.0))
            acts, logp = det_topk(logits_of(nl))
            return RecurrentOutput(
                reward=0.3 * jnp.sin(3.0 * nl),
                value=0.5 * jnp.cos(2.0 * nl),
                prior_logits=logp,
                embedding=dict(latent=nl, sampled=acts),
            )

        latent0 = jnp.asarray(obs, jnp.float64)
        acts0, logp0 = det_topk(logits_of(latent0))
        root = RootOutput(
            prior_logits=logp0,
            value=0.5 * jnp.cos(2.0 * latent0),
            embedding=dict(latent=latent0, sampled=acts0),
        )
        cfg = SearchConfig(num_simulations=num_simulations, discount=discount,
                           players=1, tie_break="first")
        out = batch_puct_search(
            None, jax.random.PRNGKey(0), root, recurrent_fn, cfg,
            jnp.ones((B, K_G), bool), to_play=jnp.full((B,), -1, jnp.int32),
            with_noise=False,
        )
        return (np.asarray(out.visit_counts), np.asarray(out.root_value),
                np.asarray(acts0))


@pytest.mark.skipif(not has_reference(), reason="reference tree not mounted")
@pytest.mark.parametrize("sims", [12, 30])
def test_sampled_discrete_visit_parity(sims):
    obs = [0.15, -0.7, 1.1]
    ref_counts, ref_vals, ref_actions = run_reference_disc(obs, sims, 0.997)
    jax_counts, jax_vals, jax_actions0 = run_jax_disc(obs, sims, 0.997)
    for i in range(len(obs)):
        np.testing.assert_array_equal(np.asarray(ref_actions[i]), jax_actions0[i])
    np.testing.assert_array_equal(jax_counts, ref_counts)
    np.testing.assert_allclose(jax_vals, ref_vals, rtol=1e-9, atol=1e-9)
