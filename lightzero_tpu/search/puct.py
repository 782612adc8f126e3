"""Batched pUCT MCTS, fully fused inside one jit/scan.

One call runs ``num_simulations`` iterations of
[traverse → recurrent_inference → expand+backup] for a whole batch of trees
in lockstep on device — the TPU-native replacement for the reference's
per-simulation C++↔Python↔GPU ping-pong
(lzero/mcts/tree_search/mcts_ctree.py:293-366).

Semantics golden-tested against the reference pure-Python tree
(lzero/mcts/ptree/ptree_mz.py):
- pUCT selection with parent-mean-Q for unvisited children
  (compute_ucb_score, ptree_mz.py:370-419; cucb_score cnode.cpp:655),
- per-node mean-Q recursion with parent_q mixing (compute_mean_q,
  ptree_mz.py:88-115),
- MinMax normalization with value_delta_max floor (minimax.py:54-70),
- backup updating every node on the path incl. the root, with the
  1-player / 2-player (self-play, sign-flipping) variants
  (backpropagate, ptree_mz.py:511-562; cnode.cpp:419-478),
- root prepare: +1 visit, Dirichlet noise mixed into legal priors
  (ptree_mz.py:217-242).

The same kernel serves MuZero (learned model), EfficientZero (embedding is a
pytree carrying the LSTM reward-hidden state), and AlphaZero (embedding is
the jitted env state; ``RecurrentOutput.legal_mask``/``terminal`` give true
env legality/termination, dissolving the reference's py::object callback
bottleneck, ctree_alphazero/mcts_alphazero.cpp:33-63).
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from lightzero_tpu.search.tree import (
    Tree,
    init_tree,
    minmax_normalize,
    root_children_values,
    root_value,
    root_visit_counts,
)
from lightzero_tpu.search.types import (
    RecurrentFn,
    RecurrentOutput,
    RootOutput,
    SearchConfig,
    SearchOutput,
)


class _TraverseState(NamedTuple):
    node: jnp.ndarray  # (B,) current node index
    parent_q: jnp.ndarray  # (B,) mean_q of the parent (0 at root)
    is_root: jnp.ndarray  # (B,) bool
    done: jnp.ndarray  # (B,) bool reached a virtual/terminal leaf
    depth: jnp.ndarray  # (B,) index of current node in path
    path: jnp.ndarray  # (B, max_depth) node indices along the path
    parent: jnp.ndarray  # (B,) parent of the leaf (valid when done)
    last_action: jnp.ndarray  # (B,) action taken into the leaf
    virtual_to_play: jnp.ndarray  # (B,)
    leaf_is_terminal_node: jnp.ndarray  # (B,) stopped at existing terminal
    rng: jax.Array


def _child_stats(tree: Tree, node: jnp.ndarray, gather_mode: str = "dynamic"):
    """Gather per-action child statistics for the given (B,) nodes.

    gather_mode='onehot' expresses the same reads as one-hot contractions
    (dense einsum on the MXU) instead of per-lane dynamic gathers — a TPU
    lowering choice, bit-identical results for the integer/index arrays."""
    B = tree.num_trees
    N = tree.num_nodes
    bidx = jnp.arange(B)
    dtype = tree.value_sum.dtype
    if gather_mode == "onehot":
        # index/count contractions are ALWAYS f32 regardless of the tree
        # value dtype: node indices up to num_nodes are exact in f32 (<2^24)
        # but NOT in bf16 (>256 rounds), so a bf16 tree would silently
        # corrupt traversal for num_simulations > 255 otherwise.
        idt = jnp.float32
        node_oh = jax.nn.one_hot(node, N, dtype=idt)  # (B, N)
        row_children = jnp.einsum(
            "bn,bna->ba", node_oh, tree.children.astype(idt)
        ).astype(jnp.int32)
        prior = jnp.einsum("bn,bna->ba", node_oh, tree.prior.astype(idt)).astype(dtype)
        legal = jnp.einsum("bn,bna->ba", node_oh, tree.legal.astype(idt)) > 0.5
        exists = row_children >= 0
        safe = jnp.maximum(row_children, 0)
        child_oh = jax.nn.one_hot(safe, N, dtype=idt)  # (B, A, N)
        child_visit = jnp.einsum("ban,bn->ba", child_oh, tree.visit_count.astype(idt))
        child_visit = jnp.where(exists, child_visit.astype(jnp.int32), 0)
        child_vsum = jnp.einsum("ban,bn->ba", child_oh, tree.value_sum.astype(idt)).astype(dtype)
        child_reward = jnp.where(
            exists, jnp.einsum("ban,bn->ba", child_oh, tree.reward.astype(idt)).astype(dtype), 0.0
        )
    else:
        row_children = tree.children[bidx, node]  # (B, A)
        exists = row_children >= 0
        safe = jnp.maximum(row_children, 0)
        b2 = bidx[:, None]
        child_visit = jnp.where(exists, tree.visit_count[b2, safe], 0)
        child_vsum = tree.value_sum[b2, safe]
        child_reward = jnp.where(exists, tree.reward[b2, safe], 0.0)
        prior = tree.prior[bidx, node]  # (B, A)
        legal = tree.legal[bidx, node]  # (B, A)
    child_value = jnp.where(
        exists & (child_visit > 0),
        child_vsum / jnp.maximum(child_visit, 1).astype(child_vsum.dtype),
        0.0,
    )
    return row_children, child_visit, child_value, child_reward, prior, legal


def _mean_q(
    cfg: SearchConfig,
    child_visit: jnp.ndarray,
    child_value: jnp.ndarray,
    child_reward: jnp.ndarray,
    legal: jnp.ndarray,
    is_root: jnp.ndarray,
    parent_q: jnp.ndarray,
) -> jnp.ndarray:
    """compute_mean_q (ptree_mz.py:88-115): mean of visited children's
    r + γ·V; non-root mixes in parent_q with weight 1."""
    visited = (child_visit > 0) & legal
    q_sa = child_reward + cfg.discount * child_value
    total_q = jnp.sum(jnp.where(visited, q_sa, 0.0), axis=-1)
    total_n = jnp.sum(visited, axis=-1).astype(total_q.dtype)
    root_mean = total_q / jnp.maximum(total_n, 1.0)
    mixed = (parent_q + total_q) / (total_n + 1.0)
    return jnp.where(is_root & (total_n > 0), root_mean, mixed)


def _ucb_scores(
    cfg: SearchConfig,
    tree: Tree,
    node: jnp.ndarray,
    parent_visit: jnp.ndarray,
    child_visit: jnp.ndarray,
    child_value: jnp.ndarray,
    child_reward: jnp.ndarray,
    prior: jnp.ndarray,
    legal: jnp.ndarray,
    mean_q: jnp.ndarray,
) -> jnp.ndarray:
    """compute_ucb_score (ptree_mz.py:370-419), batched over (B, A)."""
    pv = parent_visit.astype(prior.dtype)[:, None]
    cv = child_visit.astype(prior.dtype)
    pb_c = jnp.log((pv + cfg.pb_c_base + 1.0) / cfg.pb_c_base) + cfg.pb_c_init
    pb_c = pb_c * jnp.sqrt(pv) / (cv + 1.0)
    prior_score = pb_c * prior

    if cfg.players == 1:
        q = child_reward + cfg.discount * child_value
    else:
        q = child_reward + cfg.discount * (-child_value)
    value_score = minmax_normalize(tree.vmin, tree.vmax, cfg.value_delta_max, q)
    value_score = jnp.clip(value_score, 0.0, 1.0)
    # unvisited children score with (normalized, clipped) parent mean_q
    pq = minmax_normalize(tree.vmin, tree.vmax, cfg.value_delta_max, mean_q[:, None])
    pq = jnp.clip(pq, 0.0, 1.0)
    value_score = jnp.where(child_visit > 0, value_score, pq)

    scores = prior_score + value_score
    return jnp.where(legal, scores, -jnp.inf)


def _select_action(cfg: SearchConfig, rng: jax.Array, scores: jnp.ndarray) -> jnp.ndarray:
    """Argmax with the reference's epsilon-random tie-break (cnode.cpp:551)."""
    if cfg.tie_break == "first":
        return jnp.argmax(scores, axis=-1)
    # random among scores within epsilon of the max: add U[0, eps) noise to
    # near-max entries and re-argmax
    max_s = jnp.max(scores, axis=-1, keepdims=True)
    near = scores >= max_s - cfg.tie_break_epsilon
    u = jax.random.uniform(rng, scores.shape, scores.dtype)
    return jnp.argmax(jnp.where(near, u, -jnp.inf), axis=-1)


def _traverse(cfg: SearchConfig, tree: Tree, rng: jax.Array, to_play: jnp.ndarray):
    """Lockstep batched selection from the roots to unexpanded leaves."""
    B = tree.num_trees
    max_depth = tree.num_nodes + 1
    bidx = jnp.arange(B)
    dtype = tree.value_sum.dtype

    init = _TraverseState(
        node=jnp.zeros((B,), jnp.int32),
        parent_q=jnp.zeros((B,), dtype),
        is_root=jnp.ones((B,), bool),
        done=jnp.zeros((B,), bool),
        depth=jnp.zeros((B,), jnp.int32),
        path=jnp.zeros((B, max_depth), jnp.int32),
        parent=jnp.zeros((B,), jnp.int32),
        last_action=jnp.zeros((B,), jnp.int32),
        virtual_to_play=to_play.astype(jnp.int32),
        leaf_is_terminal_node=jnp.zeros((B,), bool),
        rng=rng,
    )

    def cond(st: _TraverseState):
        return ~jnp.all(st.done)

    def body(st: _TraverseState) -> _TraverseState:
        rng, sub = jax.random.split(st.rng)
        row_children, cvisit, cvalue, creward, prior, legal = _child_stats(
            tree, st.node, cfg.gather_mode
        )
        parent_visit = tree.visit_count[bidx, st.node]
        if cfg.gather_mode == "onehot":
            node_oh = jax.nn.one_hot(st.node, tree.num_nodes, dtype=jnp.float32)
            parent_visit = jnp.einsum(
                "bn,bn->b", node_oh, tree.visit_count.astype(jnp.float32)
            ).astype(jnp.int32)
        mean_q = _mean_q(cfg, cvisit, cvalue, creward, legal, st.is_root, st.parent_q)
        scores = _ucb_scores(
            cfg, tree, st.node, parent_visit, cvisit, cvalue, creward, prior, legal, mean_q
        )
        action = _select_action(cfg, sub, scores).astype(jnp.int32)
        if cfg.stochastic:
            # chance nodes sample the outcome from the prior distribution
            # (ctree_stochastic cnode.cpp:610-632)
            rng, c_rng = jax.random.split(rng)
            chance_logits = jnp.where(legal, jnp.log(jnp.maximum(prior, 1e-30)), -jnp.inf)
            sampled = jax.random.categorical(c_rng, chance_logits, axis=-1).astype(jnp.int32)
            node_is_chance = tree.is_chance[bidx, st.node]
            action = jnp.where(node_is_chance, sampled, action)
        next_child = row_children[bidx, action]
        child_is_terminal = jnp.where(
            next_child >= 0, tree.terminal[bidx, jnp.maximum(next_child, 0)], False
        )
        # traverse ends at a virtual child (to expand) or an existing
        # terminal node (re-evaluated, not expanded)
        now_done = (~st.done) & ((next_child < 0) | child_is_terminal)
        move = (~st.done) & (next_child >= 0)

        new_vtp = jnp.where(
            st.done,
            st.virtual_to_play,
            jnp.where(st.virtual_to_play == 1, 2, jnp.where(st.virtual_to_play == 2, 1, -1)),
        )
        new_depth = jnp.where(move, st.depth + 1, st.depth)
        new_node = jnp.where(move, next_child, st.node)
        new_path = st.path.at[bidx, new_depth].set(new_node)
        return _TraverseState(
            node=new_node,
            parent_q=jnp.where(st.done, st.parent_q, mean_q),
            is_root=st.is_root & st.done,
            done=st.done | now_done,
            depth=new_depth,
            path=new_path,
            parent=jnp.where(now_done & (next_child < 0), st.node, st.parent),
            last_action=jnp.where(st.done, st.last_action, action),
            virtual_to_play=new_vtp,
            leaf_is_terminal_node=jnp.where(
                now_done, child_is_terminal, st.leaf_is_terminal_node
            ),
            rng=rng,
        )

    st = jax.lax.while_loop(cond, body, init)
    # for trees that stopped at an existing terminal node, the "parent" used
    # for model eval is the node holding that terminal child's predecessor
    # embedding; the leaf for backup is the terminal node itself (st.node)
    parent = jnp.where(st.leaf_is_terminal_node, st.path[jnp.arange(B), jnp.maximum(st.depth - 1, 0)], st.parent)
    return st, parent


def _expand_and_backup(
    cfg: SearchConfig,
    tree: Tree,
    st: _TraverseState,
    sim: jnp.ndarray,
    out: RecurrentOutput,
    prior_is_logits: bool = False,
) -> Tree:
    """Expand the leaves (node index sim+1) and back the values up the paths
    (batch_backpropagate, ptree_mz.py:565-602)."""
    B = tree.num_trees
    A = tree.num_actions
    bidx = jnp.arange(B)
    dtype = tree.value_sum.dtype
    new_idx = (sim + 1).astype(jnp.int32)

    legal_mask = out.legal_mask if out.legal_mask is not None else jnp.ones((B, A), bool)
    terminal = out.terminal if out.terminal is not None else jnp.zeros((B,), bool)

    # trees that stopped at an existing terminal node do NOT expand
    do_expand = ~st.leaf_is_terminal_node
    leaf = jnp.where(do_expand, jnp.full((B,), new_idx), st.node)

    # --- expand (Node.expand, ptree_mz.py:46-69) ---
    logits = out.prior_logits.astype(dtype)
    if prior_is_logits:
        # gumbel trees store raw logits as priors (softmaxed on the fly)
        prior = jnp.where(legal_mask, logits, -1e9)
    else:
        masked_logits = jnp.where(legal_mask, logits, -jnp.inf)
        prior = jax.nn.softmax(masked_logits, axis=-1)
        prior = jnp.where(legal_mask, prior, 0.0)

    exp_b = do_expand
    children = tree.children.at[bidx, st.parent, st.last_action].set(
        jnp.where(exp_b, new_idx, tree.children[bidx, st.parent, st.last_action])
    )
    prior_arr = tree.prior.at[bidx, new_idx].set(
        jnp.where(exp_b[:, None], prior, tree.prior[bidx, new_idx])
    )
    legal_arr = tree.legal.at[bidx, new_idx].set(
        jnp.where(exp_b[:, None], legal_mask, tree.legal[bidx, new_idx])
    )
    reward_arr = tree.reward.at[bidx, new_idx].set(
        jnp.where(exp_b, out.reward.astype(dtype), tree.reward[bidx, new_idx])
    )
    raw_value_arr = tree.raw_value.at[bidx, new_idx].set(
        jnp.where(exp_b, out.value.astype(dtype), tree.raw_value[bidx, new_idx])
    )
    to_play_arr = tree.to_play.at[bidx, new_idx].set(
        jnp.where(exp_b, st.virtual_to_play, tree.to_play[bidx, new_idx])
    )
    terminal_arr = tree.terminal.at[bidx, new_idx].set(
        jnp.where(exp_b, terminal, tree.terminal[bidx, new_idx])
    )
    leaf_is_chance = out.is_chance if out.is_chance is not None else jnp.zeros((B,), bool)
    is_chance_arr = tree.is_chance.at[bidx, new_idx].set(
        jnp.where(exp_b, leaf_is_chance, tree.is_chance[bidx, new_idx])
    )

    def write_embedding(store, new):
        extra = (1,) * (new.ndim - 1)
        m = exp_b.reshape(B, *extra)
        return store.at[bidx, new_idx].set(jnp.where(m, new, store[bidx, new_idx]))

    embedding = jax.tree_util.tree_map(write_embedding, tree.embedding, out.embedding)

    tree = tree._replace(
        children=children,
        prior=prior_arr,
        legal=legal_arr,
        reward=reward_arr,
        raw_value=raw_value_arr,
        to_play=to_play_arr,
        terminal=terminal_arr,
        is_chance=is_chance_arr,
        embedding=embedding,
    )

    # --- backup ---
    # full path: recorded path (existing nodes) + the new leaf appended for
    # expanding trees; terminal-stopped trees already have the leaf at
    # path[depth].
    leaf_pos = jnp.where(do_expand, st.depth + 1, st.depth)
    path = st.path.at[bidx, leaf_pos].set(leaf)
    path_len = leaf_pos + 1  # number of valid entries
    value = out.value.astype(dtype)
    leaf_to_play = st.virtual_to_play

    max_len = path.shape[1]
    P = max_len
    b2 = bidx[:, None]
    # gather everything along the path ONCE (one scatter at the end instead
    # of a scatter per path position — the backup was the search's
    # sequential-bottleneck kernel)
    valid = jnp.arange(P)[None, :] < path_len[:, None]  # (B, P)
    path_nodes = jnp.where(valid, path, 0)
    node_r = tree.reward[b2, path_nodes]  # (B, P)
    if cfg.players == 2:
        same = tree.to_play[b2, path_nodes] == leaf_to_play[:, None]

    # bootstrap recurrence (right-to-left): boot_{i} entering node i;
    # boot_{L-1} = leaf value, boot_{i} = ±r_{i+1} + γ·boot_{i+1}
    def boot_step(carry, xs):
        r_next, same_next, valid_next = xs
        if cfg.players == 1:
            nxt = r_next + cfg.discount * carry
        else:
            nxt = jnp.where(same_next, -r_next, r_next) + cfg.discount * carry
        carry = jnp.where(valid_next, nxt, carry)
        return carry, carry

    # scan from i = L-1 down to 0: at step for position i we fold in r_{i+1}
    rs = jnp.flip(node_r, axis=1).T  # (P, B) reversed: position L-1 first
    if cfg.players == 2:
        ss = jnp.flip(same, axis=1).T
    else:
        ss = jnp.zeros((P, B), bool)
    vs = jnp.flip(valid, axis=1).T
    # contributions: position i gets the bootstrap BEFORE folding r_i
    _, boots_rev = jax.lax.scan(boot_step, value, (rs, ss, vs))
    # boots_rev[j] = bootstrap AFTER processing reversed position j; the
    # contribution at reversed position j is the bootstrap BEFORE it
    boots_before = jnp.concatenate([value[None], boots_rev[:-1]], axis=0)  # (P, B)
    contrib = jnp.flip(boots_before.T, axis=1)  # (B, P), aligned to path pos

    if cfg.players == 2:
        contrib_signed = jnp.where(same, contrib, -contrib)
    else:
        contrib_signed = contrib
    contrib_signed = jnp.where(valid, contrib_signed, 0.0)

    vsum = tree.value_sum.at[b2, path_nodes].add(contrib_signed)
    visit = tree.visit_count.at[b2, path_nodes].add(valid.astype(jnp.int32))

    node_value = vsum[b2, path_nodes] / jnp.maximum(visit[b2, path_nodes], 1).astype(dtype)
    if cfg.players == 1:
        q = node_r + cfg.discount * node_value
    else:
        q = node_r + cfg.discount * (-node_value)
    q = jnp.where(valid, q, jnp.inf)
    vmin = jnp.minimum(tree.vmin, jnp.min(q, axis=1))
    q = jnp.where(valid, q, -jnp.inf)
    vmax = jnp.maximum(tree.vmax, jnp.max(q, axis=1))
    return tree._replace(visit_count=visit, value_sum=vsum, vmin=vmin, vmax=vmax)


def prepare_roots(
    cfg: SearchConfig,
    tree: Tree,
    rng: Optional[jax.Array],
    root: RootOutput,
    legal_mask: jnp.ndarray,
    to_play: jnp.ndarray,
    with_noise: bool = True,
    noise: Optional[jnp.ndarray] = None,
) -> Tree:
    """Expand the roots (+1 visit) and mix Dirichlet noise into legal priors
    (Roots.prepare, ptree_mz.py:217-242)."""
    B, A = legal_mask.shape
    bidx = jnp.arange(B)
    dtype = tree.value_sum.dtype

    logits = root.prior_logits.astype(dtype)
    masked_logits = jnp.where(legal_mask, logits, -jnp.inf)
    prior = jax.nn.softmax(masked_logits, axis=-1)
    prior = jnp.where(legal_mask, prior, 0.0)

    if with_noise:
        if noise is None:
            # Dirichlet over the legal subset: iid Gamma(alpha) on legal
            # actions, normalized.
            g = jax.random.gamma(rng, cfg.root_dirichlet_alpha, (B, A), dtype)
            g = jnp.where(legal_mask, g, 0.0)
            noise = g / jnp.maximum(jnp.sum(g, axis=-1, keepdims=True), 1e-30)
        prior = prior * (1.0 - cfg.root_noise_weight) + noise.astype(dtype) * cfg.root_noise_weight
        prior = jnp.where(legal_mask, prior, 0.0)

    def set_root_embedding(store, new):
        return store.at[:, 0].set(new)

    return tree._replace(
        prior=tree.prior.at[:, 0].set(prior),
        legal=tree.legal.at[:, 0].set(legal_mask),
        visit_count=tree.visit_count.at[:, 0].set(1),
        raw_value=tree.raw_value.at[:, 0].set(root.value.astype(dtype)),
        to_play=tree.to_play.at[:, 0].set(to_play.astype(jnp.int32)),
        embedding=jax.tree_util.tree_map(set_root_embedding, tree.embedding, root.embedding),
    )


@functools.partial(jax.jit, static_argnames=("cfg", "recurrent_fn", "with_noise"))
def batch_puct_search(
    params: Any,
    rng: jax.Array,
    root: RootOutput,
    recurrent_fn: RecurrentFn,
    cfg: SearchConfig,
    legal_mask: jnp.ndarray,
    to_play: Optional[jnp.ndarray] = None,
    with_noise: bool = True,
    noise: Optional[jnp.ndarray] = None,
) -> SearchOutput:
    """Run the full batched search; everything stays on device.

    Equivalent of MuZeroMCTSCtree.search (mcts_ctree.py:265-366) +
    roots.prepare, as ONE compiled function.
    """
    B, A = legal_mask.shape
    N = cfg.num_simulations + 1
    if to_play is None:
        to_play = jnp.full((B,), -1, jnp.int32)

    rng, prep_rng = jax.random.split(rng)
    tree = init_tree(B, N, A, root.embedding, dtype=root.prior_logits.dtype)
    tree = prepare_roots(cfg, tree, prep_rng, root, legal_mask, to_play, with_noise, noise)

    bidx = jnp.arange(B)

    def sim_body(carry, sim):
        tree, rng = carry
        rng, t_rng, m_rng = jax.random.split(rng, 3)
        st, parent = _traverse(cfg, tree, t_rng, to_play)
        # model eval: parent embedding + last action -> leaf stats
        if cfg.gather_mode == "onehot":

            def _gather_emb(e):
                # contract in the embedding's own floating dtype; integer
                # embeddings go through f32 (exact below 2^24) so that a
                # bf16 tree dtype can never round index-like payloads
                cdtype = e.dtype if jnp.issubdtype(e.dtype, jnp.floating) else jnp.float32
                parent_oh = jax.nn.one_hot(parent, tree.num_nodes, dtype=cdtype)
                flat = e.reshape(e.shape[0], e.shape[1], -1).astype(cdtype)
                out = jnp.einsum("bn,bnf->bf", parent_oh, flat)
                if not jnp.issubdtype(e.dtype, jnp.floating):
                    out = jnp.round(out)
                return out.reshape((e.shape[0],) + e.shape[2:]).astype(e.dtype)

            parent_embedding = jax.tree_util.tree_map(_gather_emb, tree.embedding)
        else:
            parent_embedding = jax.tree_util.tree_map(lambda e: e[bidx, parent], tree.embedding)
        out = recurrent_fn(params, m_rng, st.last_action, parent_embedding)
        tree = _expand_and_backup(cfg, tree, st._replace(parent=parent), sim, out)
        return (tree, rng), st.depth

    (tree, _), depths = jax.lax.scan(
        sim_body, (tree, rng), jnp.arange(cfg.num_simulations)
    )

    return SearchOutput(
        visit_counts=root_visit_counts(tree),
        root_value=root_value(tree),
        root_children_values=root_children_values(tree, cfg.discount),
        improved_policy=None,
        tree=tree,
    )
