"""Golden + property tests for the ReZero reuse-search.

The reuse mechanism exists only in the reference C++ tree
(ctree_muzero/lib/cnode.cpp: cbatch_traverse_with_reuse :827, carm_score
:702, cbatch_backpropagate_with_reuse :502, early break :894-897). The
mirror below re-implements those semantics on top of the reference ptree's
own Node/MinMaxStats/select/backpropagate primitives (ptree_mz.py), keeping
the ptree's visit-count convention that all our golden tests anchor on, and
compares visit counts / root values exactly against the fused JAX search
with ``true_action``/``reuse_value``.
"""
import numpy as np
import pytest

from conftest import has_reference, load_reference_module

pytestmark = [
    pytest.mark.slow,  # compile-heavy: not in the fast tier
    pytest.mark.unittest,
    pytest.mark.skipif(not has_reference(), reason="reference tree not mounted"),
]


# shared deterministic fake model (same spec as test_puct_search_golden)
def fake_logits(latent, num_actions):
    return np.stack([np.sin(latent * (a + 1) * 1.7) for a in range(num_actions)], -1) * 2.0


def fake_value(latent):
    return np.cos(latent * 2.0) * 0.5


def fake_next_latent(latent, action):
    return np.tanh(latent * 1.3 + (action + 1) * 0.37)


def fake_reward(latent):
    return np.sin(latent * 3.0) * 0.5


def _carm_score(ptree, child, min_max_stats, parent_mean_q, reuse_value,
                total_children_visit_counts, pb_c_base, pb_c_init, discount, players):
    """carm_score (cnode.cpp:702): prior+parent_mean_q when unvisited;
    normalized(r + γ·(±reuse_value)) ONLY (no prior term) once visited."""
    import math

    pb_c = math.log((total_children_visit_counts + pb_c_base + 1) / pb_c_base) + pb_c_init
    pb_c *= math.sqrt(total_children_visit_counts) / (child.visit_count + 1)
    prior_score = pb_c * child.prior
    if child.visit_count == 0:
        value_score = parent_mean_q
    else:
        if players == 1:
            value_score = child.reward + discount * reuse_value
        else:
            value_score = child.reward + discount * (-reuse_value)
    value_score = min_max_stats.normalize(value_score)
    value_score = min(max(value_score, 0.0), 1.0)
    if child.visit_count == 0:
        return prior_score + value_score
    return value_score


def _select_root_child_reuse(ptree, node, stats, mean_q, discount, players,
                             true_action, reuse_value):
    """cselect_root_child (cnode.cpp:598) with first-index tie-break."""
    max_score = -np.inf
    best = []
    eps = 1e-6
    for a in node.legal_actions:
        child = node.get_child(a)
        if a == true_action:
            s = _carm_score(ptree, child, stats, mean_q, reuse_value,
                            node.visit_count, 19652, 1.25, discount, players)
        else:
            s = ptree.compute_ucb_score(child, stats, mean_q, node.visit_count,
                                        19652, 1.25, discount, players)
        if s > max_score:
            max_score = s
            best = [a]
        elif s >= max_score - eps:
            best.append(a)
    return best[0]


def run_reference_reuse_search(obs, legal_lists, num_sims, A, discount, to_play,
                               players, true_action, reuse_value):
    """Mirror of MuZeroMCTSCtree.search_with_reuse (mcts_ctree.py:368-465)
    on the reference ptree primitives."""
    minimax = load_reference_module("lzero/mcts/ptree/minimax.py")
    ptree = load_reference_module("lzero/mcts/ptree/ptree_mz.py")
    ptree.random.choice = lambda lst: lst[0]

    B = len(obs)
    roots = ptree.Roots(B, legal_lists)
    latent0 = np.asarray(obs, np.float64)
    roots.prepare_no_noise([0.0] * B, [list(l) for l in fake_logits(latent0, A)], list(to_play))
    stats_lst = minimax.MinMaxStatsList(B)
    stats_lst.set_delta(0.01)
    latents = {id(r): latent0[i] for i, r in enumerate(roots.roots)}

    for _sim in range(num_sims):
        for i, root in enumerate(roots.roots):
            node = root
            is_root = True
            parent_q = 0.0
            vtp = to_play[i]
            path = [node]
            last_action = -1
            while node.expanded:
                mean_q = node.compute_mean_q(is_root, parent_q, discount)
                parent_q = mean_q
                if is_root:
                    action = _select_root_child_reuse(
                        ptree, node, stats_lst.stats_lst[i], mean_q, discount,
                        players, true_action[i], reuse_value[i])
                else:
                    action = ptree.select_child(node, stats_lst.stats_lst[i],
                                                19652, 1.25, discount, mean_q, players)
                if players == 2:
                    vtp = 2 if vtp == 1 else 1
                node.best_action = action
                parent_node = node
                node = node.get_child(action)
                last_action = action
                path.append(node)
                if is_root and action == true_action[i]:
                    break
                is_root = False
            if node.expanded:
                # no_inference: backup the reused value, no expansion
                ptree.backpropagate(path, stats_lst.stats_lst[i], vtp,
                                    float(reuse_value[i]), discount)
            else:
                pl = latents[id(parent_node)]
                nl = fake_next_latent(pl, np.asarray(last_action))
                latents[id(node)] = nl
                node.expand(vtp, 0, 0, float(fake_reward(nl)),
                            list(fake_logits(nl[None], A)[0]))
                if len(path) == 2 and last_action == true_action[i]:
                    v = float(reuse_value[i])  # reuse_lst branch
                else:
                    v = float(fake_value(nl))
                ptree.backpropagate(path, stats_lst.stats_lst[i], vtp, v, discount)
    return (
        np.array(roots.get_distributions(), dtype=object),
        np.asarray(roots.get_values(), np.float64),
    )


def run_jax_reuse_search(obs, legal_mask, num_sims, A, discount, to_play, players,
                         true_action, reuse_value):
    import jax

    with jax.enable_x64(True):
        import jax.numpy as jnp

        from lightzero_tpu.search import (
            RecurrentOutput,
            RootOutput,
            SearchConfig,
            batch_puct_search,
        )

        def recurrent_fn(params, rng, action, embedding):
            nl = jnp.tanh(embedding * 1.3 + (action + 1) * 0.37)
            return RecurrentOutput(
                reward=jnp.sin(nl * 3.0) * 0.5,
                value=jnp.cos(nl * 2.0) * 0.5,
                prior_logits=jnp.stack(
                    [jnp.sin(nl * (a + 1) * 1.7) for a in range(A)], -1) * 2.0,
                embedding=nl,
            )

        latent0 = jnp.asarray(obs, jnp.float64)
        root = RootOutput(
            prior_logits=jnp.asarray(fake_logits(np.asarray(obs, np.float64), A)),
            value=jnp.asarray(fake_value(np.asarray(obs, np.float64))),
            embedding=latent0,
        )
        cfg = SearchConfig(num_simulations=num_sims, discount=discount,
                           players=players, tie_break="first")
        out = batch_puct_search(
            None, jax.random.PRNGKey(0), root, recurrent_fn, cfg,
            jnp.asarray(legal_mask),
            to_play=jnp.asarray(to_play, jnp.int32),
            with_noise=False,
            true_action=jnp.asarray(true_action, jnp.int32),
            reuse_value=jnp.asarray(reuse_value, jnp.float64),
        )
        return np.asarray(out.visit_counts), np.asarray(out.root_value)


def _compare_reuse(obs, legal_lists, num_sims, A, discount, to_play, players,
                   true_action, reuse_value):
    B = len(obs)
    legal_mask = np.zeros((B, A), bool)
    for i, la in enumerate(legal_lists):
        legal_mask[i, la] = True
    ref_dist, ref_vals = run_reference_reuse_search(
        obs, legal_lists, num_sims, A, discount, list(to_play), players,
        true_action, reuse_value)
    jax_dist, jax_vals = run_jax_reuse_search(
        obs, legal_mask, num_sims, A, discount, to_play, players,
        true_action, reuse_value)
    for i in range(B):
        ref_counts = np.zeros(A, np.int64)
        ref_counts[np.asarray(legal_lists[i])] = np.asarray(ref_dist[i], np.int64)
        np.testing.assert_array_equal(
            jax_dist[i], ref_counts, err_msg=f"reuse visit counts differ for tree {i}")
    np.testing.assert_allclose(jax_vals, ref_vals, rtol=1e-9, atol=1e-9)


def test_reuse_single_player_golden():
    obs = [0.1, 0.5, -0.3, 0.9]
    A = 5
    legal = [list(range(A))] * 4
    _compare_reuse(obs, legal, 30, A, 0.997, [-1] * 4, 1,
                   true_action=[0, 2, 4, 1], reuse_value=[0.8, -0.4, 0.1, 1.5])


def test_reuse_two_player_golden():
    obs = [0.15, -0.45, 0.62]
    A = 6
    legal = [list(range(A))] * 3
    _compare_reuse(obs, legal, 25, A, 1.0, [1, 2, 1], 2,
                   true_action=[3, 0, 5], reuse_value=[0.9, 0.2, -0.7])


def test_reuse_masked_legal_golden():
    obs = [0.4, -0.6]
    A = 7
    legal = [[0, 2, 4], [1, 3, 5, 6]]
    _compare_reuse(obs, legal, 35, A, 0.997, [-1, -1], 1,
                   true_action=[2, 6], reuse_value=[2.0, -1.0])


def test_reuse_high_value_attracts_visits():
    """A very attractive reused value should concentrate root visits on the
    true action (the ReZero shortcut: root picks it -> depth-1 stop)."""
    import jax
    import jax.numpy as jnp

    from lightzero_tpu.search import (
        RecurrentOutput,
        RootOutput,
        SearchConfig,
        batch_puct_search,
    )

    B, A, S = 4, 4, 40

    def recurrent_fn(params, rng, action, embedding):
        nl = jnp.tanh(embedding * 1.3 + (action + 1) * 0.37)
        return RecurrentOutput(
            reward=jnp.zeros_like(nl),
            value=jnp.zeros_like(nl),
            prior_logits=jnp.zeros(nl.shape + (A,)),
            embedding=nl,
        )

    root = RootOutput(
        prior_logits=jnp.zeros((B, A)),
        value=jnp.zeros((B,)),
        embedding=jnp.linspace(-1, 1, B),
    )
    cfg = SearchConfig(num_simulations=S, tie_break="first")
    out = batch_puct_search(
        None, jax.random.PRNGKey(0), root, recurrent_fn, cfg,
        jnp.ones((B, A), bool), with_noise=False,
        true_action=jnp.full((B,), 2, jnp.int32),
        reuse_value=jnp.full((B,), 50.0),
    )
    counts = np.asarray(out.visit_counts)
    assert (counts[:, 2] > S * 0.8).all(), counts


def test_reanalyze_buffer_reuse_path():
    """Buffer-level backward-order reuse reanalyze rewrites stored targets."""
    import jax
    import jax.numpy as jnp

    from lightzero_tpu.buffers.game_buffer import GameBuffer
    from lightzero_tpu.policy import MuZeroPolicy

    cfg = MuZeroPolicy.default_config()
    cfg.model.observation_shape = 4
    cfg.model.action_space_size = 2
    cfg.model.latent_state_dim = 16
    cfg.model.support_scale = 25
    cfg.num_simulations = 5
    cfg.batch_size = 4
    policy = MuZeroPolicy(cfg)
    params = policy.model.init_params(jax.random.PRNGKey(0), batch_size=2)

    buf = GameBuffer(cfg, policy)
    from tests_helpers_buffers import fake_episode

    episodes = [fake_episode(T=6, A=2, obs_dim=4, seed=s) for s in range(3)]
    buf.push_episodes(episodes, [np.ones(6, np.float32)] * 3)
    before = [ep.child_visits.copy() for ep in buf._episodes]
    n = buf.reanalyze_buffer(params, jax.random.PRNGKey(1),
                             reanalyze_batch_size=4, partition=1.0,
                             reuse_search=True)
    assert n == 18
    changed = any(
        not np.allclose(b, ep.child_visits)
        for b, ep in zip(before, buf._episodes)
    )
    assert changed
