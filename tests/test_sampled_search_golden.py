"""Golden test: our fused search in sampled-continuous configuration vs the
reference sampled tree (lzero/mcts/ptree/ptree_sez.py) driven by an
identical deterministic fake model.

The ONLY mocked ingredient is the Gaussian action sampling: both searches
draw the K candidate actions at every node from the same fixed z-grid
(pre_tanh = mu + sigma * z_j), so the sampled trees are structurally
identical and the density-prior pUCT (compute_ucb_score
node_prior='density', ptree_sez.py:598-613), mean-Q initialization of
unvisited children (:619-620) and value-prefix backup (is_reset=0 — plain
cumulative rewards) must produce EXACTLY matching visit counts in f64.

This is the debugging oracle VERDICT.md round-2 item 3 calls for.
"""
import math

import numpy as np
import pytest

from conftest import has_reference, load_reference_module

pytestmark = [
    pytest.mark.unittest,
    pytest.mark.skipif(not has_reference(), reason="reference tree not mounted"),
]

A = 1   # action dim (pendulum-like)
K = 6   # num_of_sampled_actions
Z = np.linspace(-1.6, 1.6, K)  # shared deterministic "sampling" grid


# ---------------- deterministic fake model (shared numpy spec) -------------
def fake_mu_sigma(latent):
    latent = np.asarray(latent, np.float64)
    mu = 0.6 * np.sin(latent * 1.3)
    sigma = 0.4 + 0.3 / (1.0 + np.exp(-latent))
    return mu, sigma


def fake_next_latent(latent, action):
    return np.tanh(latent * 1.1 + 0.9 * np.asarray(action, np.float64))


def fake_reward(latent):
    return 0.3 * np.sin(3.0 * latent)


def fake_value(latent):
    return 0.5 * np.cos(2.0 * latent)


def det_sample_np(mu, sigma):
    """(K,) pre-tanh samples + tanh-corrected log densities for scalar mu/sigma."""
    pre = mu + sigma * Z
    act = np.tanh(pre)
    logp = (-0.5 * ((pre - mu) / sigma) ** 2 - np.log(sigma) - 0.5 * math.log(2 * math.pi))
    logp = logp - np.log(1.0 - act ** 2 + 1e-6)
    return pre, act, logp


# ---------------- reference ptree_sez driver -------------------------------
def run_reference_sez(obs, num_simulations, discount):
    import torch

    minimax = load_reference_module("lzero/mcts/ptree/minimax.py")
    ptree = load_reference_module("lzero/mcts/ptree/ptree_sez.py")
    ptree.random.choice = lambda lst: lst[0]  # tie_break='first'
    torch.set_default_dtype(torch.float64)  # match the f64 JAX side exactly

    class DetIndependent:
        """Stands in for torch Independent(Normal, 1): .sample draws the
        shared z-grid; .log_prob is the exact diagonal-Gaussian density."""

        def __init__(self, normal, dims):
            self.loc, self.scale = normal.loc, normal.scale

        def sample(self, shape):
            k = int(shape[0])
            z = torch.tensor(Z[:k], dtype=self.loc.dtype)
            return self.loc.unsqueeze(0) + self.scale.unsqueeze(0) * z.unsqueeze(-1)

        def log_prob(self, x):
            lp = (-0.5 * ((x - self.loc) / self.scale) ** 2
                  - torch.log(self.scale) - 0.5 * math.log(2 * math.pi))
            return lp.sum(-1)

    ptree.Independent = DetIndependent

    B = len(obs)
    roots = ptree.Roots(B, None, action_space_size=A,
                        num_of_sampled_actions=K, continuous_action_space=True)
    latent0 = np.asarray(obs, np.float64)
    mu0, s0 = fake_mu_sigma(latent0)
    policies0 = [[float(mu0[i])] * A + [float(s0[i])] * A for i in range(B)]
    roots.prepare_no_noise([0.0] * B, policies0, [-1] * B)

    stats_lst = minimax.MinMaxStatsList(B)
    stats_lst.set_delta(0.01)

    latent_pool = [latent0]
    vp_pool = [np.zeros(B)]
    for sim in range(num_simulations):
        results = ptree.SearchResults(num=B)
        idx_path, idx_batch, last_actions, vtp = ptree.batch_traverse(
            roots, 19652, 1.25, discount, stats_lst, results, [-1] * B,
            continuous_action_space=True,
        )
        parent_latent = np.array(
            [latent_pool[idx_path[i]][idx_batch[i]] for i in range(B)], np.float64
        )
        parent_vp = np.array(
            [vp_pool[idx_path[i]][idx_batch[i]] for i in range(B)], np.float64
        )
        actions = np.asarray([np.asarray(a).reshape(-1)[0] for a in last_actions], np.float64)
        nl = fake_next_latent(parent_latent, actions)
        vp = parent_vp + fake_reward(nl)
        latent_pool.append(nl)
        vp_pool.append(vp)
        mu, s = fake_mu_sigma(nl)
        policies = [[float(mu[i])] * A + [float(s[i])] * A for i in range(B)]
        ptree.batch_backpropagate(
            sim + 1, discount, list(vp), list(fake_value(nl)), policies,
            stats_lst, results, [0] * B, [-1] * B,
        )
    return (
        np.array([d for d in roots.get_distributions()], dtype=np.int64),
        np.asarray(roots.get_values(), np.float64),
        [np.asarray(sa) for sa in roots.get_sampled_actions()],
    )


# ---------------- our fused search in sampled configuration ----------------
def run_jax_sampled(obs, num_simulations, discount):
    import jax

    with jax.enable_x64(True):
        import jax.numpy as jnp

        from lightzero_tpu.search import (
            RecurrentOutput, RootOutput, SearchConfig, batch_puct_search,
        )

        B = len(obs)

        def det_sample_jnp(mu, sigma):
            z = jnp.asarray(Z, jnp.float64)
            pre = mu[:, None] + sigma[:, None] * z[None, :]
            act = jnp.tanh(pre)
            logp = (-0.5 * ((pre - mu[:, None]) / sigma[:, None]) ** 2
                    - jnp.log(sigma[:, None]) - 0.5 * math.log(2 * math.pi))
            logp = logp - jnp.log(1.0 - act ** 2 + 1e-6)
            return act, logp

        def recurrent_fn(params, rng, slot, emb):
            bidx = jnp.arange(B)
            action = emb["sampled"][bidx, slot]
            nl = jnp.tanh(emb["latent"] * 1.1 + 0.9 * action)
            mu = 0.6 * jnp.sin(nl * 1.3)
            sigma = 0.4 + 0.3 * jax.nn.sigmoid(nl)
            acts, logp = det_sample_jnp(mu, sigma)
            return RecurrentOutput(
                reward=0.3 * jnp.sin(3.0 * nl),
                value=0.5 * jnp.cos(2.0 * nl),
                prior_logits=logp,
                embedding=dict(latent=nl, sampled=acts),
            )

        latent0 = jnp.asarray(obs, jnp.float64)
        mu0 = 0.6 * jnp.sin(latent0 * 1.3)
        s0 = 0.4 + 0.3 * jax.nn.sigmoid(latent0)
        acts0, logp0 = det_sample_jnp(mu0, s0)
        root = RootOutput(
            prior_logits=logp0,
            value=0.5 * jnp.cos(2.0 * latent0),
            embedding=dict(latent=latent0, sampled=acts0),
        )
        cfg = SearchConfig(
            num_simulations=num_simulations, discount=discount, players=1,
            tie_break="first",
        )
        out = batch_puct_search(
            None, jax.random.PRNGKey(0), root, recurrent_fn, cfg,
            jnp.ones((B, K), bool), to_play=jnp.full((B,), -1, jnp.int32),
            with_noise=False,
        )
        return (np.asarray(out.visit_counts), np.asarray(out.root_value),
                np.asarray(acts0))


@pytest.mark.parametrize("sims", [12, 30])
def test_sampled_continuous_visit_parity(sims):
    obs = [0.15, -0.7, 1.1]
    ref_counts, ref_vals, ref_actions = run_reference_sez(obs, sims, 0.997)
    jax_counts, jax_vals, jax_actions0 = run_jax_sampled(obs, sims, 0.997)
    # identical candidate sets at the root (sanity of the shared sampler)
    for i in range(len(obs)):
        np.testing.assert_allclose(
            np.sort(np.asarray([np.asarray(a.value).reshape(-1)[0]
                                for a in ref_actions[i]], np.float64)),
            np.sort(jax_actions0[i]), rtol=1e-12,
        )
    np.testing.assert_array_equal(jax_counts, ref_counts)
    np.testing.assert_allclose(jax_vals, ref_vals, rtol=1e-9, atol=1e-9)
