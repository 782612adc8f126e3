"""Golden test: batched JAX pUCT search vs the reference pure-Python tree
(lzero/mcts/ptree/ptree_mz.py) driven by an identical deterministic fake
model — the behavioral-spec pattern recommended in SURVEY.md §4.

Both searches run with deterministic first-index tie-breaking and float64 so
visit counts must match EXACTLY.
"""
import numpy as np
import pytest

from conftest import has_reference, load_reference_module

pytestmark = [
    pytest.mark.slow,  # compile-heavy: not in the fast tier
    pytest.mark.unittest,
    pytest.mark.skipif(not has_reference(), reason="reference tree not mounted"),
]


# ---------------- deterministic fake model (shared numpy spec) -------------
def fake_logits(latent: np.ndarray, num_actions: int) -> np.ndarray:
    return np.stack([np.sin(latent * (a + 1) * 1.7) for a in range(num_actions)], -1) * 2.0


def fake_value(latent: np.ndarray) -> np.ndarray:
    return np.cos(latent * 2.0) * 0.5


def fake_next_latent(latent: np.ndarray, action: np.ndarray) -> np.ndarray:
    return np.tanh(latent * 1.3 + (action + 1) * 0.37)


def fake_reward(latent: np.ndarray) -> np.ndarray:
    return np.sin(latent * 3.0) * 0.5


# ---------------- reference ptree driver ----------------------------------
def run_reference_search(
    obs, legal_actions_list, num_simulations, num_actions, discount, to_play, noises=None,
    root_noise_weight=0.25,
):
    """Mirror of MuZeroMCTSCtree.search (mcts_ctree.py:265-366) driving the
    reference ptree with the shared fake model."""
    import random as _random

    minimax = load_reference_module("lzero/mcts/ptree/minimax.py")
    ptree = load_reference_module("lzero/mcts/ptree/ptree_mz.py")
    # deterministic tie-break: first element (matches tie_break='first')
    ptree.random.choice = lambda lst: lst[0]

    B = len(obs)
    roots = ptree.Roots(B, legal_actions_list)
    latent0 = np.asarray(obs, np.float64)
    logits0 = fake_logits(latent0, num_actions)
    rewards0 = [0.0] * B
    if noises is not None:
        roots.prepare(root_noise_weight, [list(n) for n in noises], rewards0,
                      [list(l) for l in logits0], list(to_play))
    else:
        roots.prepare_no_noise(rewards0, [list(l) for l in logits0], list(to_play))

    stats_lst = minimax.MinMaxStatsList(B)
    stats_lst.set_delta(0.01)

    latent_pool = [latent0]  # indexed by simulation_index
    for sim in range(num_simulations):
        results = ptree.SearchResults(num=B)
        vtp = list(to_play)
        idx_path, idx_batch, last_actions, vtp = ptree.batch_traverse(
            roots, 19652, 1.25, discount, stats_lst, results, vtp
        )
        parent_latent = np.array(
            [latent_pool[idx_path[i]][idx_batch[i]] for i in range(B)], np.float64
        )
        actions = np.asarray(last_actions, np.int64)
        nl = fake_next_latent(parent_latent, actions)
        latent_pool.append(nl)
        ptree.batch_backpropagate(
            sim + 1,
            discount,
            list(fake_reward(nl)),
            list(fake_value(nl)),
            [list(l) for l in fake_logits(nl, num_actions)],
            stats_lst,
            results,
            list(vtp),
        )
    return (
        np.array(roots.get_distributions(), dtype=object),
        np.asarray(roots.get_values(), np.float64),
    )


# ---------------- JAX search driver ----------------------------------------
def run_jax_search(obs, legal_mask, num_simulations, num_actions, discount, to_play,
                   players, noises=None, root_noise_weight=0.25):
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
                    [jnp.sin(nl * (a + 1) * 1.7) for a in range(num_actions)], -1
                ) * 2.0,
                embedding=nl,
            )

        latent0 = jnp.asarray(obs, jnp.float64)
        root = RootOutput(
            prior_logits=jnp.asarray(fake_logits(np.asarray(obs, np.float64), num_actions)),
            value=jnp.asarray(fake_value(np.asarray(obs, np.float64))),
            embedding=latent0,
        )
        cfg = SearchConfig(
            num_simulations=num_simulations,
            discount=discount,
            players=players,
            tie_break="first",
            root_noise_weight=root_noise_weight,
        )
        out = batch_puct_search(
            None,
            jax.random.PRNGKey(0),
            root,
            recurrent_fn,
            cfg,
            jnp.asarray(legal_mask),
            to_play=jnp.asarray(to_play, jnp.int32),
            with_noise=noises is not None,
            noise=None if noises is None else jnp.asarray(noises, jnp.float64),
        )
        return np.asarray(out.visit_counts), np.asarray(out.root_value)


def _compare(obs, legal_lists, num_sims, A, discount, to_play, players, noises=None):
    B = len(obs)
    legal_mask = np.zeros((B, A), bool)
    for i, la in enumerate(legal_lists):
        legal_mask[i, la] = True
    noise_full = None
    if noises is not None:
        noise_full = np.zeros((B, A))
        for i, la in enumerate(legal_lists):
            noise_full[i, la] = noises[i]
    ref_dist, ref_vals = run_reference_search(
        obs, legal_lists, num_sims, A, discount, list(to_play), noises=noises
    )
    jax_dist, jax_vals = run_jax_search(
        obs, legal_mask, num_sims, A, discount, to_play, players, noises=noise_full
    )
    for i in range(B):
        ref_counts = np.zeros(A, np.int64)
        ref_counts[np.asarray(legal_lists[i])] = np.asarray(ref_dist[i], np.int64)
        np.testing.assert_array_equal(
            jax_dist[i], ref_counts, err_msg=f"visit counts differ for tree {i}"
        )
    np.testing.assert_allclose(jax_vals, ref_vals, rtol=1e-9, atol=1e-9)


def test_single_player_full_actions():
    obs = [0.1, 0.5, 0.9, -0.3]
    A = 5
    legal = [list(range(A))] * 4
    to_play = [-1, -1, -1, -1]
    _compare(obs, legal, 30, A, 0.997, to_play, players=1)


def test_single_player_with_dirichlet_noise():
    rng = np.random.RandomState(7)
    obs = [0.2, -0.8]
    A = 4
    legal = [list(range(A))] * 2
    noises = [rng.dirichlet([0.3] * A) for _ in range(2)]
    _compare(obs, legal, 25, A, 0.997, [-1, -1], players=1, noises=noises)


def test_single_player_masked_legal_actions():
    obs = [0.4, -0.6, 1.2]
    A = 7
    legal = [[0, 2, 4], [1, 3, 5, 6], [0, 1, 2, 3, 4, 5, 6]]
    _compare(obs, legal, 40, A, 0.997, [-1, -1, -1], players=1)


def test_two_player_board_game_backup():
    obs = [0.15, -0.45]
    A = 6
    legal = [list(range(A))] * 2
    # board games: discount=1, players alternate
    _compare(obs, legal, 30, A, 1.0, [1, 2], players=2)


def test_two_player_masked_with_noise():
    rng = np.random.RandomState(3)
    obs = [0.33, 0.77, -0.2]
    A = 9
    legal = [[0, 1, 4, 8], [2, 3, 5], list(range(9))]
    noises = [rng.dirichlet([0.3] * len(l)) for l in legal]
    _compare(obs, legal, 35, A, 1.0, [2, 1, 1], players=2, noises=noises)


def test_bot_mode_board_game_single_player_backup():
    """play_with_bot_mode: board-game policy config (players=2) but
    to_play=-1 — the search must take the reference's SINGLE-player path
    (ptree_mz.backpropagate:525 dispatches on to_play==-1 at runtime;
    cnode.cpp derives players from virtual_to_play). Regression test for
    the round-2 Connect4 bot-mode learning failure: the static players=2
    branch negated child values in pUCT and rewards in backup."""
    obs = [0.15, -0.45, 0.6]
    A = 7
    legal = [list(range(A))] * 3
    _compare(obs, legal, 50, A, 1.0, [-1, -1, -1], players=2)


def test_bot_mode_masked_with_noise():
    rng = np.random.RandomState(11)
    obs = [0.33, -0.9]
    A = 7
    legal = [[0, 1, 3, 5], list(range(A))]
    noises = [rng.dirichlet([0.3] * len(l)) for l in legal]
    _compare(obs, legal, 40, A, 1.0, [-1, -1], players=2, noises=noises)


def test_visit_count_invariants():
    """Sum of root-child visits == num_simulations; root visits == sims+1."""
    import jax
    import jax.numpy as jnp

    from lightzero_tpu.search import (
        RecurrentOutput,
        RootOutput,
        SearchConfig,
        batch_puct_search,
    )

    B, A, S = 8, 4, 50
    rng = jax.random.PRNGKey(1)

    def recurrent_fn(params, r, action, embedding):
        nl = jnp.tanh(embedding * 1.1 + action.astype(embedding.dtype))
        return RecurrentOutput(
            reward=nl * 0.1,
            value=nl * 0.5,
            prior_logits=jnp.stack([nl * (a + 1) for a in range(A)], -1),
            embedding=nl,
        )

    root = RootOutput(
        prior_logits=jax.random.normal(rng, (B, A)),
        value=jnp.zeros((B,)),
        embedding=jax.random.normal(rng, (B,)),
    )
    out = batch_puct_search(
        None,
        rng,
        root,
        recurrent_fn,
        SearchConfig(num_simulations=S, tie_break="noise"),
        jnp.ones((B, A), bool),
    )
    np.testing.assert_array_equal(np.asarray(out.visit_counts.sum(-1)), S)
    np.testing.assert_array_equal(np.asarray(out.tree.visit_count[:, 0]), S + 1)


def test_onehot_gather_mode_identical():
    """gather_mode='onehot' (MXU contractions) must produce identical visit
    counts to the dynamic-gather lowering."""
    import jax
    import jax.numpy as jnp

    from lightzero_tpu.search import (
        RecurrentOutput,
        RootOutput,
        SearchConfig,
        batch_puct_search,
    )

    B, A, S = 6, 5, 40

    def recurrent_fn(params, r, action, embedding):
        nl = jnp.tanh(embedding * 1.3 + (action + 1) * 0.37)
        return RecurrentOutput(
            reward=jnp.sin(nl * 3.0) * 0.5,
            value=jnp.cos(nl * 2.0) * 0.5,
            prior_logits=jnp.stack([jnp.sin(nl * (a + 1) * 1.7) for a in range(A)], -1) * 2.0,
            embedding=nl,
        )

    rng = jax.random.PRNGKey(5)
    root = RootOutput(
        prior_logits=jax.random.normal(rng, (B, A)),
        value=jnp.zeros((B,)),
        embedding=jax.random.normal(rng, (B,)),
    )
    legal = jnp.asarray([[True] * A, [True, False, True, False, True]] * 3)
    outs = {}
    for mode in ("dynamic", "onehot"):
        cfg = SearchConfig(num_simulations=S, tie_break="first", gather_mode=mode)
        outs[mode] = batch_puct_search(
            None, jax.random.PRNGKey(0), root, recurrent_fn, cfg, legal, with_noise=False
        )
    np.testing.assert_array_equal(
        np.asarray(outs["dynamic"].visit_counts), np.asarray(outs["onehot"].visit_counts)
    )
    np.testing.assert_allclose(
        np.asarray(outs["dynamic"].root_value),
        np.asarray(outs["onehot"].root_value),
        rtol=1e-5,
    )
