"""Batched Gumbel MuZero search (Sequential Halving + completed-Q policy).

Capability-parity rebuild of reference
lzero/mcts/ctree/ctree_gumbel_muzero/lib/cnode.cpp:
- root child selection by Sequential Halving over Gumbel-perturbed scores
  (cselect_root_child :700, get_sequence_of_considered_visits,
  score_considered :1096),
- interior selection by argmax(π′(a) − N(a)/(1+ΣN)) with π′ =
  softmax(logits + σ(completedQ)) (cselect_interior_child :747),
- completed Q by mixed value (compute_mixed_value :934,
  qtransform_completed_by_mix_value :988 with defaults maxvisit_init=50,
  value_scale=0.1, min-max rescale),
- improved-policy extraction for training targets (get_policies :372).

Tree layout/backup shared with the pUCT kernel; the per-node ``prior``
array stores RAW policy logits here (the reference gumbel tree does the
same), softmaxed on the fly inside the q-transform.
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from lightzero_tpu.search.puct import _expand_and_backup, _TraverseState
from lightzero_tpu.search.tree import (
    Tree,
    init_tree,
    root_children_values,
    root_value,
    root_visit_counts,
)
from lightzero_tpu.search.types import (
    RecurrentFn,
    RootOutput,
    SearchConfig,
    SearchOutput,
)

_LOW_LOGIT = -1e9


@dataclasses.dataclass(frozen=True)
class GumbelSearchConfig:
    num_simulations: int = 50
    max_num_considered_actions: int = 4
    discount: float = 0.997
    maxvisit_init: float = 50.0
    value_scale: float = 0.1
    rescale_values: bool = True
    rescale_epsilon: float = 1e-6
    gumbel_scale: float = 1.0
    players: int = 1
    value_delta_max: float = 0.01  # backup minmax floor (shared backup)

    def as_puct(self) -> SearchConfig:
        return SearchConfig(
            num_simulations=self.num_simulations,
            discount=self.discount,
            players=self.players,
            value_delta_max=self.value_delta_max,
        )


def sequence_of_considered_visits(max_num_considered: int, num_simulations: int) -> np.ndarray:
    """Sequential-halving visit schedule (get_sequence_of_considered_visits)."""
    if max_num_considered <= 1:
        return np.arange(num_simulations, dtype=np.int32)
    log2max = int(math.ceil(math.log2(max_num_considered)))
    seq = []
    visits = [0] * max_num_considered
    num_considered = max_num_considered
    while len(seq) < num_simulations:
        num_extra = max(1, num_simulations // (log2max * num_considered))
        for _ in range(num_extra):
            seq.extend(visits[:num_considered])
            for j in range(num_considered):
                visits[j] += 1
        num_considered = max(2, num_considered // 2)
    return np.asarray(seq[:num_simulations], np.int32)


def _completed_q(cfg: GumbelSearchConfig, tree: Tree, node: jnp.ndarray):
    """σ(completedQ) per action of `node` (B, A) + masked logits (B, A).

    qtransform_completed_by_mix_value (cnode.cpp:988)."""
    B = tree.num_trees
    bidx = jnp.arange(B)
    b2 = bidx[:, None]
    row_children = tree.children[bidx, node]
    exists = row_children >= 0
    safe = jnp.maximum(row_children, 0)
    cvisit = jnp.where(exists, tree.visit_count[b2, safe], 0)
    cvsum = tree.value_sum[b2, safe]
    cvalue = jnp.where(
        exists & (cvisit > 0), cvsum / jnp.maximum(cvisit, 1).astype(cvsum.dtype), 0.0
    )
    creward = jnp.where(exists, tree.reward[b2, safe], 0.0)
    logits = tree.prior[bidx, node]  # raw logits, illegal = _LOW_LOGIT
    legal = tree.legal[bidx, node]

    if cfg.players == 1:
        q = creward + cfg.discount * cvalue
    else:
        # runtime 1p/2p dispatch: to_play==-1 (play_with_bot_mode) means
        # single-player semantics even for board games (cnode.cpp derives
        # players from virtual_to_play at runtime)
        one_p = (tree.to_play[:, :1] == -1)
        q = creward + cfg.discount * jnp.where(one_p, cvalue, -cvalue)
    visited = (cvisit > 0) & legal
    probs = jax.nn.softmax(jnp.where(legal, logits, -jnp.inf), axis=-1)
    sum_n = jnp.sum(jnp.where(legal, cvisit, 0), axis=-1).astype(q.dtype)
    probs_sum = jnp.sum(jnp.where(visited, probs, 0.0), axis=-1)
    weighted_q = jnp.sum(
        jnp.where(visited, probs * q, 0.0), axis=-1
    ) / jnp.maximum(probs_sum, 1e-12)
    weighted_q = jnp.where(probs_sum > 0, weighted_q, 0.0)
    raw_v = tree.raw_value[bidx, node]
    v_mix = (raw_v + sum_n * weighted_q) / (sum_n + 1.0)

    completed = jnp.where(visited, q, v_mix[:, None])
    if cfg.rescale_values:
        cmax = jnp.max(jnp.where(legal, completed, -jnp.inf), axis=-1, keepdims=True)
        cmin = jnp.min(jnp.where(legal, completed, jnp.inf), axis=-1, keepdims=True)
        gap = jnp.maximum(cmax - cmin, cfg.rescale_epsilon)
        completed = (completed - cmin) / gap
    max_visit = jnp.max(jnp.where(legal, cvisit, 0), axis=-1, keepdims=True).astype(q.dtype)
    completed = completed * (cfg.maxvisit_init + max_visit) * cfg.value_scale
    return completed, logits, legal, cvisit, row_children, sum_n


def _root_select(
    cfg: GumbelSearchConfig,
    tree: Tree,
    gumbel: jnp.ndarray,
    considered_visit: jnp.ndarray,
) -> jnp.ndarray:
    """cselect_root_child (cnode.cpp:700) + score_considered (:1096)."""
    B = tree.num_trees
    node = jnp.zeros((B,), jnp.int32)
    completed, logits, legal, cvisit, _, _ = _completed_q(cfg, tree, node)
    shifted = logits - jnp.max(jnp.where(legal, logits, -jnp.inf), axis=-1, keepdims=True)
    score = jnp.maximum(_LOW_LOGIT, gumbel + shifted + completed)
    score = jnp.where(cvisit == considered_visit, score, -jnp.inf)
    score = jnp.where(legal, score, -jnp.inf)
    return jnp.argmax(score, axis=-1).astype(jnp.int32)


def _interior_select(cfg: GumbelSearchConfig, tree: Tree, node: jnp.ndarray) -> jnp.ndarray:
    """cselect_interior_child (cnode.cpp:747)."""
    completed, logits, legal, cvisit, _, sum_n = _completed_q(cfg, tree, node)
    probs = jax.nn.softmax(jnp.where(legal, logits + completed, -jnp.inf), axis=-1)
    to_argmax = probs - cvisit.astype(probs.dtype) / (1.0 + sum_n[:, None])
    to_argmax = jnp.where(legal, to_argmax, -jnp.inf)
    return jnp.argmax(to_argmax, axis=-1).astype(jnp.int32)


def improved_policy(cfg: GumbelSearchConfig, tree: Tree) -> jnp.ndarray:
    """Root improved policy softmax(logits + σ(completedQ)) (get_policies,
    cnode.cpp:372) — the Gumbel training target and action distribution."""
    B = tree.num_trees
    node = jnp.zeros((B,), jnp.int32)
    completed, logits, legal, _, _, _ = _completed_q(cfg, tree, node)
    probs = jax.nn.softmax(jnp.where(legal, logits + completed, -jnp.inf), axis=-1)
    return jnp.where(legal, probs, 0.0)


def _gumbel_traverse(
    cfg: GumbelSearchConfig,
    tree: Tree,
    considered_visit: jnp.ndarray,
    to_play: jnp.ndarray,
    gumbel: jnp.ndarray,
):
    """Deterministic descent: sequential-halving action at the root,
    completed-Q improved-policy argmax at interior nodes."""
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
        rng=jax.random.PRNGKey(0),
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
        # gumbel-perturbed root action via schedule; gumbel-free interior
        root_a = _root_select(cfg, tree, gumbel, considered_visit)
        int_a = _interior_select(cfg, tree, st.node)
        action = jnp.where(st.is_root, root_a, int_a)
        row_children = tree.children[bidx, st.node]
        exists = row_children >= 0
        safe = jnp.maximum(row_children, 0)
        b2 = bidx[:, None]
        cvisit = jnp.where(exists, tree.visit_count[b2, safe], 0).astype(dtype)
        cvsum = jnp.where(exists, tree.value_sum[b2, safe], 0.0)
        creward = jnp.where(exists, tree.reward[b2, safe], 0.0)
        action_oh = jax.nn.one_hot(action, row_children.shape[1], dtype=dtype)

        def sel(row_ba):
            return jnp.sum(row_ba * action_oh, axis=-1)

        next_child = row_children[bidx, action]
        child_is_terminal = jnp.where(
            next_child >= 0, tree.terminal[bidx, jnp.maximum(next_child, 0)], False
        )
        now_done = (~st.done) & ((next_child < 0) | child_is_terminal)
        move = (~st.done) & (next_child >= 0)
        new_vtp = jnp.where(
            st.done,
            st.virtual_to_play,
            jnp.where(st.virtual_to_play == 1, 2, jnp.where(st.virtual_to_play == 2, 1, -1)),
        )
        new_depth = jnp.where(move, st.depth + 1, st.depth)
        new_node = jnp.where(move, next_child, st.node)

        def col(arr, val):
            return jax.lax.dynamic_update_slice_in_dim(arr, val[:, None], t + 1, axis=1)

        st = _TraverseState(
            node=new_node,
            parent_q=st.parent_q,
            is_root=st.is_root & st.done,
            done=st.done | now_done,
            depth=new_depth,
            path=col(st.path, new_node),
            parent=jnp.where(now_done & (next_child < 0), st.node, st.parent),
            last_action=jnp.where(st.done, st.last_action, action),
            virtual_to_play=new_vtp,
            leaf_is_terminal_node=jnp.where(now_done, child_is_terminal, st.leaf_is_terminal_node),
            rng=st.rng,
            path_action=col(st.path_action, action),
            path_reward=col(st.path_reward, sel(creward)),
            path_vsum=col(st.path_vsum, sel(cvsum)),
            path_visit=col(st.path_visit, sel(cvisit)),
            path_to_play=col(st.path_to_play, new_vtp),
            reuse_hit=st.reuse_hit,
        )
        return (t + 1, st)

    _, st = jax.lax.while_loop(cond, body, (jnp.int32(0), init))
    parent = jnp.where(
        st.leaf_is_terminal_node,
        st.path[jnp.arange(B), jnp.maximum(st.depth - 1, 0)],
        st.parent,
    )
    return st, parent


@functools.partial(jax.jit, static_argnames=("cfg", "recurrent_fn"))
def batch_gumbel_search(
    params: Any,
    rng: jax.Array,
    root: RootOutput,
    recurrent_fn: RecurrentFn,
    cfg: GumbelSearchConfig,
    legal_mask: jnp.ndarray,
    to_play: Optional[jnp.ndarray] = None,
) -> SearchOutput:
    B, A = legal_mask.shape
    N = cfg.num_simulations + 1
    if to_play is None:
        to_play = jnp.full((B,), -1, jnp.int32)
    dtype = root.prior_logits.dtype

    # static sequential-halving schedule (one row of the reference's table:
    # num_considered = min(max_considered, num_simulations), cnode.cpp:726)
    num_considered = min(cfg.max_num_considered_actions, cfg.num_simulations)
    schedule = jnp.asarray(
        sequence_of_considered_visits(num_considered, cfg.num_simulations)
    )

    rng, g_rng = jax.random.split(rng)
    gumbel = cfg.gumbel_scale * jax.random.gumbel(g_rng, (B, A), dtype)
    gumbel = jnp.where(legal_mask, gumbel, -jnp.inf)

    tree = init_tree(B, N, A, root.embedding, dtype=dtype)
    # root prepare: raw logits as priors, +1 visit, store raw value
    logits = jnp.where(legal_mask, root.prior_logits.astype(dtype), _LOW_LOGIT)

    def set_root_embedding(store, new):
        return store.at[:, 0].set(new)

    tree = tree._replace(
        prior=tree.prior.at[:, 0].set(logits),
        legal=tree.legal.at[:, 0].set(legal_mask),
        visit_count=tree.visit_count.at[:, 0].set(1),
        raw_value=tree.raw_value.at[:, 0].set(root.value.astype(dtype)),
        to_play=tree.to_play.at[:, 0].set(to_play.astype(jnp.int32)),
        embedding=jax.tree_util.tree_map(set_root_embedding, tree.embedding, root.embedding),
    )

    puct_cfg = cfg.as_puct()
    bidx = jnp.arange(B)

    def sim_body(carry, sim):
        tree, rng = carry
        rng, m_rng = jax.random.split(rng)
        st, parent = _gumbel_traverse(cfg, tree, schedule[sim], to_play, gumbel)
        parent_embedding = jax.tree_util.tree_map(lambda e: e[bidx, parent], tree.embedding)
        out = recurrent_fn(params, m_rng, st.last_action, parent_embedding)
        # store raw logits as priors for gumbel q-transforms
        out = out._replace(
            prior_logits=jnp.where(
                out.legal_mask if out.legal_mask is not None else True,
                out.prior_logits,
                _LOW_LOGIT,
            )
        )
        tree = _expand_and_backup(
            puct_cfg, tree, st._replace(parent=parent), sim, out, prior_is_logits=True
        )
        return (tree, rng), st.depth

    (tree, _), _ = jax.lax.scan(sim_body, (tree, rng), jnp.arange(cfg.num_simulations))

    return SearchOutput(
        visit_counts=root_visit_counts(tree),
        root_value=root_value(tree),
        root_children_values=root_children_values(tree, cfg.discount),
        improved_policy=improved_policy(cfg, tree),
        tree=tree,
    )
