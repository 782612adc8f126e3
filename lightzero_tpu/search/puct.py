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
    # per-depth recordings made during the descent so that backup needs NO
    # node-indexed gathers (TPU gathers/scatters were the search bottleneck):
    # position 0 holds the root's pre-backup stats, position i>0 the stats of
    # the node entered at depth i
    path_action: jnp.ndarray  # (B, max_depth) action taken into each node
    path_reward: jnp.ndarray  # (B, max_depth) reward of each path node
    path_vsum: jnp.ndarray  # (B, max_depth) pre-backup value_sum of each node
    path_visit: jnp.ndarray  # (B, max_depth) pre-backup visit count
    path_to_play: jnp.ndarray  # (B, max_depth) to_play of each path node
    # ReZero reuse-search: True when the root selected the trajectory's true
    # action (descent stops at depth 1; backup uses the reused value)
    reuse_hit: jnp.ndarray  # (B,) bool


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
        # the reference derives 1p/2p AT RUNTIME from virtual_to_play
        # (cnode.cpp cbatch_traverse: all -1 => players=1) — bot-mode board
        # games (to_play=-1) use single-player semantics even when the
        # policy config says board_games
        one_p = (tree.to_play[:, :1] == -1)
        q = child_reward + cfg.discount * jnp.where(one_p, child_value, -child_value)
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


def _pack_traverse_tables(tree: Tree) -> jnp.ndarray:
    """Pack everything the traverse loop reads into ONE (B, N, 7A+2) table.

    Tree statistics are invariant during a single traverse (they only change
    in expand/backup, once per simulation), so per-child stats gathered from
    the child rows can be flattened into the parent row ONCE per simulation.
    The while-loop body then gathers a single row per depth step instead of
    issuing ~6 separate gathers/einsums — the search's sequential bottleneck
    on TPU was the kernel-launch chain inside this loop.

    Layout along the last axis (A = num_actions):
      [0:A)   child node index (float; exact below 2^24)
      [A:2A)  prior
      [2A:3A) legal (0/1)
      [3A:4A) child visit count
      [4A:5A) child value_sum
      [5A:6A) child reward
      [6A:7A) child terminal (0/1)
      [7A]    node's own visit count
      [7A+1]  node is_chance (0/1)
    """
    B, N, A = tree.num_trees, tree.num_nodes, tree.num_actions
    dtype = tree.value_sum.dtype
    ch = tree.children
    exists = ch >= 0
    # gather per-child stats as ONE batched one-hot matmul — element-wise
    # dynamic gathers (take_along_axis) cost ~2ms each on TPU at this size
    # while the equivalent (B, N·A, N) × (B, N, 4) contraction is ~50µs
    cdtype = jnp.promote_types(dtype, jnp.float32)
    child_oh = jax.nn.one_hot(jnp.maximum(ch, 0).reshape(B, N * A), N, dtype=cdtype)
    stats_nodes = jnp.stack(
        [
            tree.visit_count.astype(cdtype),
            tree.value_sum.astype(cdtype),
            tree.reward.astype(cdtype),
            tree.terminal.astype(cdtype),
        ],
        axis=-1,
    )  # (B, N, 4)
    child_tab = jax.lax.dot_general(
        child_oh,
        stats_nodes,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=cdtype,
    ).reshape(B, N, A, 4)
    exists_f = exists.astype(cdtype)[..., None]
    child_tab = (child_tab * exists_f).astype(dtype)
    cvisit = child_tab[..., 0]
    cvsum = child_tab[..., 1]
    creward = child_tab[..., 2]
    cterm = child_tab[..., 3]
    return jnp.concatenate(
        [
            ch.astype(dtype),
            tree.prior.astype(dtype),
            tree.legal.astype(dtype),
            cvisit,
            cvsum,
            creward,
            cterm,
            tree.visit_count[..., None].astype(dtype),
            tree.is_chance[..., None].astype(dtype),
        ],
        axis=2,
    )


def _traverse_pallas(cfg, tree, packed, noise_u, to_play, rng):
    """Fused-kernel traverse (search/pallas_traverse.py) for the
    players==1 / non-stochastic / non-reuse case; output-compatible with
    `_traverse` (exact parity asserted by tests/test_pallas_traverse.py)."""
    from lightzero_tpu.search.pallas_traverse import pallas_traverse

    B, N, A = tree.num_trees, tree.num_nodes, tree.num_actions
    max_depth = N + 1
    dtype = tree.value_sum.dtype
    root_stats = jnp.stack(
        [
            tree.reward[:, 0].astype(jnp.float32),
            tree.value_sum[:, 0].astype(jnp.float32),
            tree.visit_count[:, 0].astype(jnp.float32),
            jnp.zeros((B,), jnp.float32),
        ],
        axis=1,
    )
    scal, path, paction, preward, pvsum, pvisit = pallas_traverse(
        packed, tree.vmin, tree.vmax, root_stats, noise_u,
        A=A, N=N, max_depth=max_depth,
        discount=float(cfg.discount),
        pb_c_base=float(cfg.pb_c_base),
        pb_c_init=float(cfg.pb_c_init),
        value_delta_max=float(cfg.value_delta_max),
        tie_break_first=(cfg.tie_break == "first"),
        tie_break_epsilon=float(cfg.tie_break_epsilon),
        interpret=(jax.default_backend() == "cpu"),
    )
    node = jnp.round(scal[:, 0]).astype(jnp.int32)
    parent = jnp.round(scal[:, 1]).astype(jnp.int32)
    last_action = jnp.round(scal[:, 2]).astype(jnp.int32)
    depth = jnp.round(scal[:, 3]).astype(jnp.int32)
    leaf_term = scal[:, 4] > 0.5
    path_i = jnp.round(path).astype(jnp.int32)
    # virtual_to_play: -1 stays -1; players 1/2 flip once per body iteration
    # (= depth+1 iterations until done), matching the XLA loop
    tp = to_play.astype(jnp.int32)
    flips = depth + 1
    flipped = jnp.where(flips % 2 == 1, jnp.where(tp == 1, 2, 1), tp)
    vtp = jnp.where(tp == -1, -jnp.ones_like(tp), flipped)
    pos = jnp.arange(max_depth)[None, :]
    tp_c = jnp.where(pos % 2 == 1, jnp.where(tp[:, None] == 1, 2, 1), tp[:, None])
    path_to_play = jnp.where(tp[:, None] == -1, -jnp.ones_like(tp_c), tp_c)
    st = _TraverseState(
        node=node,
        parent_q=jnp.zeros((B,), dtype),
        is_root=jnp.zeros((B,), bool),
        done=jnp.ones((B,), bool),
        depth=depth,
        path=path_i,
        parent=parent,
        last_action=last_action,
        virtual_to_play=vtp,
        leaf_is_terminal_node=leaf_term,
        rng=rng,
        path_action=jnp.round(paction).astype(jnp.int32),
        path_reward=preward.astype(dtype),
        path_vsum=pvsum.astype(dtype),
        path_visit=pvisit.astype(dtype),
        path_to_play=path_to_play,
        reuse_hit=jnp.zeros((B,), bool),
    )
    parent_out = jnp.where(
        leaf_term, path_i[jnp.arange(B), jnp.maximum(depth - 1, 0)], parent
    )
    return st, parent_out


def _traverse(
    cfg: SearchConfig,
    tree: Tree,
    rng: jax.Array,
    to_play: jnp.ndarray,
    true_action: Optional[jnp.ndarray] = None,
    reuse_value: Optional[jnp.ndarray] = None,
):
    """Lockstep batched selection from the roots to unexpanded leaves.

    ``true_action``/``reuse_value`` enable the ReZero reuse-search variant
    (cbatch_traverse_with_reuse, ctree_muzero/lib/cnode.cpp:827): the root
    scores the trajectory's true action with the reused next-state search
    value via carm_score (cnode.cpp:702 — value-only score once visited),
    and the descent stops at depth 1 whenever the root picks that action.

    All randomness (tie-break uniforms; chance-node Gumbel sampling in
    stochastic mode) is pregenerated as (max_depth, B, A) tables indexed by
    the iteration counter — at iteration t every still-active tree is at
    depth t, so one noise row per iteration is exactly one row per depth.
    This keeps the while-loop body free of PRNG kernels.
    """
    B = tree.num_trees
    N = tree.num_nodes
    A = tree.num_actions
    max_depth = N + 1
    bidx = jnp.arange(B)
    dtype = tree.value_sum.dtype

    packed = _pack_traverse_tables(tree)

    if cfg.tie_break == "first":
        noise_u = None
    else:
        rng, u_rng = jax.random.split(rng)
        noise_u = jax.random.uniform(u_rng, (max_depth, B, A), dtype)

    if (
        cfg.use_pallas_traverse
        and cfg.players == 1
        and not cfg.stochastic
        and true_action is None
    ):
        return _traverse_pallas(cfg, tree, packed, noise_u, to_play, rng)
    if cfg.stochastic:
        rng, g_rng = jax.random.split(rng)
        # categorical via the Gumbel-max trick so chance sampling needs no
        # in-loop PRNG (ctree_stochastic cnode.cpp:610-632)
        noise_g = jax.random.gumbel(g_rng, (max_depth, B, A), dtype)
    else:
        noise_g = jnp.zeros((1, 1, 1), dtype)

    # column 0 of the path recordings = the root's pre-backup stats (static
    # row-0 slices, no gathers)
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
        path_action=jnp.zeros((B, max_depth), jnp.int32),
        path_reward=jnp.zeros((B, max_depth), dtype).at[:, 0].set(tree.reward[:, 0]),
        path_vsum=jnp.zeros((B, max_depth), dtype).at[:, 0].set(tree.value_sum[:, 0]),
        path_visit=jnp.zeros((B, max_depth), dtype).at[:, 0].set(
            tree.visit_count[:, 0].astype(dtype)
        ),
        path_to_play=jnp.zeros((B, max_depth), jnp.int32).at[:, 0].set(tree.to_play[:, 0]),
        reuse_hit=jnp.zeros((B,), bool),
    )

    def cond(carry):
        t, st = carry
        return ~jnp.all(st.done)

    def body(carry):
        t, st = carry
        if cfg.gather_mode == "onehot":
            # f32 one-hot contraction (exact for indices < 2^24) unless the
            # tree itself is higher precision
            cdtype = jnp.promote_types(dtype, jnp.float32)
            node_oh = jax.nn.one_hot(st.node, N, dtype=cdtype)
            row = jnp.einsum("bn,bnc->bc", node_oh, packed.astype(cdtype)).astype(dtype)
        else:
            row = packed[bidx, st.node]  # (B, 7A+2)
        row_children = jnp.round(row[:, :A]).astype(jnp.int32)
        prior = row[:, A : 2 * A]
        legal = row[:, 2 * A : 3 * A] > 0.5
        cvisit = row[:, 3 * A : 4 * A]
        cvsum = row[:, 4 * A : 5 * A]
        creward = row[:, 5 * A : 6 * A]
        cterm = row[:, 6 * A : 7 * A] > 0.5
        parent_visit = row[:, 7 * A]
        exists = row_children >= 0
        cvalue = jnp.where(
            exists & (cvisit > 0), cvsum / jnp.maximum(cvisit, 1.0), 0.0
        )
        cvisit = jnp.where(exists, cvisit, 0.0)
        creward = jnp.where(exists, creward, 0.0)

        mean_q = _mean_q(cfg, cvisit, cvalue, creward, legal, st.is_root, st.parent_q)
        scores = _ucb_scores(
            cfg, tree, st.node, parent_visit, cvisit, cvalue, creward, prior, legal, mean_q
        )
        if true_action is not None:
            # carm_score (cnode.cpp:702) for the true-action arm at the root:
            # once visited, score = normalized(r + γ·(±reuse_value)) with NO
            # prior/exploration term; unvisited arms keep the normal formula.
            ta_oh = jax.nn.one_hot(true_action, A, dtype=dtype)
            r_true = jnp.sum(creward * ta_oh, axis=-1)
            visited_true = jnp.sum(cvisit * ta_oh, axis=-1) > 0
            if cfg.players == 1:
                q_arm = r_true + cfg.discount * reuse_value.astype(dtype)
            else:
                q_arm = r_true + cfg.discount * jnp.where(
                    to_play == -1, reuse_value.astype(dtype), -reuse_value.astype(dtype)
                )
            v_arm = jnp.clip(
                minmax_normalize(tree.vmin, tree.vmax, cfg.value_delta_max, q_arm), 0.0, 1.0
            )
            override = (st.is_root & visited_true)[:, None] & (ta_oh > 0.5)
            scores = jnp.where(override, v_arm[:, None], scores)
        if cfg.tie_break == "first":
            action = jnp.argmax(scores, axis=-1).astype(jnp.int32)
        else:
            max_s = jnp.max(scores, axis=-1, keepdims=True)
            near = scores >= max_s - cfg.tie_break_epsilon
            u = jax.lax.dynamic_index_in_dim(noise_u, t, 0, keepdims=False)
            action = jnp.argmax(jnp.where(near, u, -jnp.inf), axis=-1).astype(jnp.int32)
        if cfg.stochastic:
            # chance nodes sample the outcome from the prior distribution
            chance_logits = jnp.where(legal, jnp.log(jnp.maximum(prior, 1e-30)), -jnp.inf)
            gn = jax.lax.dynamic_index_in_dim(noise_g, t, 0, keepdims=False)
            sampled = jnp.argmax(chance_logits + gn, axis=-1).astype(jnp.int32)
            node_is_chance = row[:, 7 * A + 1] > 0.5
            action = jnp.where(node_is_chance, sampled, action)
        action_oh = jax.nn.one_hot(action, A, dtype=dtype)

        def sel(row_ba):
            return jnp.sum(row_ba * action_oh, axis=-1)

        next_child = jnp.round(sel(row_children.astype(dtype))).astype(jnp.int32)
        child_is_terminal = sel(cterm.astype(dtype)) > 0.5
        entered_reward = sel(creward)
        entered_vsum = sel(cvsum)
        entered_visit = sel(cvisit)
        if true_action is not None:
            # ReZero: the descent BREAKS whenever the root picks the true
            # action (cnode.cpp:894-897); if that child already exists it is
            # re-used without expansion, like a terminal stop
            reuse_stop = st.is_root & (~st.done) & (action == true_action)
            stop_exist = reuse_stop & (next_child >= 0)
            child_is_terminal = child_is_terminal | stop_exist
        else:
            reuse_stop = jnp.zeros_like(st.done)
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
        # at iteration t every mover lands at depth t+1, so the path write is
        # a single column update; stalled/done lanes write garbage into
        # column t+1 beyond their own depth, which backup masks out
        def col(arr, val):
            return jax.lax.dynamic_update_slice_in_dim(arr, val[:, None], t + 1, axis=1)

        st = _TraverseState(
            node=new_node,
            parent_q=jnp.where(st.done, st.parent_q, mean_q),
            is_root=st.is_root & st.done,
            done=st.done | now_done,
            depth=new_depth,
            path=col(st.path, new_node),
            parent=jnp.where(now_done & (next_child < 0), st.node, st.parent),
            last_action=jnp.where(st.done, st.last_action, action),
            virtual_to_play=new_vtp,
            leaf_is_terminal_node=jnp.where(
                now_done, child_is_terminal, st.leaf_is_terminal_node
            ),
            rng=st.rng,
            path_action=col(st.path_action, action),
            path_reward=col(st.path_reward, entered_reward),
            path_vsum=col(st.path_vsum, entered_vsum),
            path_visit=col(st.path_visit, entered_visit),
            path_to_play=col(st.path_to_play, new_vtp),
            reuse_hit=st.reuse_hit | reuse_stop,
        )
        return (t + 1, st)

    _, st = jax.lax.while_loop(cond, body, (jnp.int32(0), init))
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
    value_override: Optional[jnp.ndarray] = None,
) -> Tree:
    """Expand the leaves (node index sim+1) and back the values up the paths
    (batch_backpropagate, ptree_mz.py:565-602). ``value_override`` replaces
    the backed-up leaf value per lane where finite (ReZero reuse,
    cbatch_backpropagate_with_reuse, cnode.cpp:502)."""
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

    def _row_write(arr, new_row):
        """Write row `new_idx` (uniform across the batch — node i is the node
        expanded by simulation i) where exp_b, via dynamic slices instead of
        per-lane scatters."""
        old = jax.lax.dynamic_slice_in_dim(arr, new_idx, 1, axis=1)  # (B, 1, ...)
        m = exp_b.reshape((B, 1) + (1,) * (arr.ndim - 2))
        row = jnp.where(m, new_row[:, None], old)
        return jax.lax.dynamic_update_slice_in_dim(arr, row, new_idx, axis=1)

    # children[b, parent_b, action_b] = new_idx where expanding: a fused
    # one-hot masked rewrite instead of a gather+scatter pair
    link_mask = (
        (jnp.arange(tree.num_nodes)[None, :, None] == st.parent[:, None, None])
        & (jnp.arange(A)[None, None, :] == st.last_action[:, None, None])
        & exp_b[:, None, None]
    )
    children = jnp.where(link_mask, new_idx, tree.children)
    prior_arr = _row_write(tree.prior, prior)
    legal_arr = _row_write(tree.legal, legal_mask)
    reward_arr = _row_write(tree.reward, out.reward.astype(dtype))
    raw_value_arr = _row_write(tree.raw_value, out.value.astype(dtype))
    to_play_arr = _row_write(tree.to_play, st.virtual_to_play)
    terminal_arr = _row_write(tree.terminal, terminal)
    leaf_is_chance = out.is_chance if out.is_chance is not None else jnp.zeros((B,), bool)
    is_chance_arr = _row_write(tree.is_chance, leaf_is_chance)

    embedding = jax.tree_util.tree_map(_row_write, tree.embedding, out.embedding)

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
    # path[depth]. All per-node stats were RECORDED during the descent, so
    # backup is pure (B, P) elementwise math — no node-indexed gathers.
    leaf_pos = jnp.where(do_expand, st.depth + 1, st.depth)
    P = st.path.shape[1]
    pos = jnp.arange(P)[None, :]
    exp_mask = (pos == leaf_pos[:, None]) & do_expand[:, None]  # (B, P)
    path = jnp.where(exp_mask, new_idx, st.path)
    node_r = jnp.where(exp_mask, out.reward.astype(dtype)[:, None], st.path_reward)
    pre_vsum = jnp.where(exp_mask, 0.0, st.path_vsum)
    pre_visit = jnp.where(exp_mask, 0.0, st.path_visit)
    path_len = leaf_pos + 1  # number of valid entries
    value = out.value.astype(dtype)
    if value_override is not None:
        value = jnp.where(st.reuse_hit, value_override.astype(dtype), value)
    leaf_to_play = st.virtual_to_play

    valid = pos < path_len[:, None]  # (B, P)
    if cfg.players == 2:
        # runtime 1p/2p dispatch on to_play == -1 (play_with_bot_mode):
        # reference ptree_mz.backpropagate:525 takes the single-player path
        # for to_play in {-1, None} even for board games
        one_p = (leaf_to_play == -1)[:, None]  # (B, 1)
        tp_path = jnp.where(exp_mask, leaf_to_play[:, None], st.path_to_play)
        same = tp_path == leaf_to_play[:, None]

    # bootstrap recurrence (right-to-left): contrib_{L-1} = leaf value,
    # contrib_i = ±r_{i+1} + γ·contrib_{i+1}. This is a suffix composition of
    # affine maps g_i(x) = a_i·x + b_i with a_i = γ, b_i = ±r_{i+1} for valid
    # positions (identity past the leaf), computed with an associative scan
    # (O(log P) sequential depth instead of a P-step sequential scan — the
    # per-simulation backup was the search's dominant kernel chain on TPU).
    if cfg.players == 1:
        r_signed = node_r
    else:
        r_signed = jnp.where(same & ~one_p, -node_r, node_r)
    # shift left: position i folds in reward/validity of position i+1
    r_next = jnp.concatenate([r_signed[:, 1:], jnp.zeros((B, 1), dtype)], axis=1)
    valid_next = jnp.concatenate([valid[:, 1:], jnp.zeros((B, 1), bool)], axis=1)
    a_elems = jnp.where(valid_next, jnp.asarray(cfg.discount, dtype), 1.0)
    b_elems = jnp.where(valid_next, r_next, 0.0)

    def compose(left, right):
        # reverse=True folds with the accumulated suffix as the LEFT operand,
        # so combine as (right ∘ left)(x) = a_r·(a_l·x + b_l) + b_r, giving
        # suffix[i] = g_i ∘ g_{i+1} ∘ … ∘ g_{P-1}
        a_l, b_l = left
        a_r, b_r = right
        return a_r * a_l, a_r * b_l + b_r

    A_sfx, B_sfx = jax.lax.associative_scan(
        compose, (a_elems, b_elems), reverse=True, axis=1
    )
    contrib = A_sfx * value[:, None] + B_sfx  # (B, P), aligned to path pos

    if cfg.players == 2:
        contrib_signed = jnp.where(same | one_p, contrib, -contrib)
    else:
        contrib_signed = contrib
    contrib_signed = jnp.where(valid, contrib_signed, 0.0)

    # scatter-add via one-hot contraction (each path node appears exactly
    # once per path, so the sum has a single term per node — exact)
    cdtype = jnp.promote_types(dtype, jnp.float32)
    path_oh = jax.nn.one_hot(path, tree.num_nodes, dtype=cdtype) * valid[
        ..., None
    ].astype(cdtype)  # (B, P, N)
    vsum_add = jnp.einsum("bpn,bp->bn", path_oh, contrib_signed.astype(cdtype))
    visit_add = jnp.sum(path_oh, axis=1)
    vsum = tree.value_sum + vsum_add.astype(dtype)
    visit = tree.visit_count + jnp.round(visit_add).astype(jnp.int32)

    # post-backup node value from the recorded pre-backup stats: each path
    # node received exactly this backup's contribution once
    new_visit_p = pre_visit + 1.0
    node_value = (pre_vsum + contrib_signed) / new_visit_p
    if cfg.players == 1:
        q = node_r + cfg.discount * node_value
    else:
        q = node_r + cfg.discount * jnp.where(one_p, node_value, -node_value)
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
    true_action: Optional[jnp.ndarray] = None,
    reuse_value: Optional[jnp.ndarray] = None,
) -> SearchOutput:
    """Run the full batched search; everything stays on device.

    Equivalent of MuZeroMCTSCtree.search (mcts_ctree.py:265-366) +
    roots.prepare, as ONE compiled function. Passing ``true_action`` +
    ``reuse_value`` selects the ReZero reuse-search variant
    (MuZeroMCTSCtree.search_with_reuse, mcts_ctree.py:368-465).
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
        st, parent = _traverse(cfg, tree, t_rng, to_play, true_action, reuse_value)
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
        tree = _expand_and_backup(
            cfg, tree, st._replace(parent=parent), sim, out, value_override=reuse_value
        )
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
