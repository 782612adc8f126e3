"""Array-based batched search tree.

The reference keeps per-node statistics in C++ pointer trees and latent
states in Python-side pools indexed by (simulation_index, batch_index)
(lzero/mcts/tree_search/mcts_ctree.py:103,137-140). Here both live in fixed
shape device arrays: node ``i`` is the node expanded by simulation ``i``
(node 0 = root), so ``num_nodes = num_simulations + 1`` and every array is
statically shaped — the layout XLA needs.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

NO_PARENT = jnp.int32(-1)
UNVISITED = jnp.int32(-1)


class Tree(NamedTuple):
    """A batch of B independent trees with N = num_simulations + 1 nodes."""

    visit_count: jnp.ndarray  # (B, N) int32
    value_sum: jnp.ndarray  # (B, N) f32
    reward: jnp.ndarray  # (B, N) f32 (value_prefix for EfficientZero)
    raw_value: jnp.ndarray  # (B, N) f32 network value at expansion (Gumbel mixed-value)
    prior: jnp.ndarray  # (B, N, A) f32 children priors
    children: jnp.ndarray  # (B, N, A) int32 child node index, -1 = virtual
    to_play: jnp.ndarray  # (B, N) int32 player at node (-1 = 1p mode)
    terminal: jnp.ndarray  # (B, N) bool absorbing state (env-sim search)
    is_chance: jnp.ndarray  # (B, N) bool chance/afterstate node (Stochastic MuZero)
    legal: jnp.ndarray  # (B, N, A) bool legal child actions
    embedding: Any  # pytree of (B, N, ...) per-node latent
    # per-tree MinMax stats (reference cminimax.h:14-37)
    vmin: jnp.ndarray  # (B,)
    vmax: jnp.ndarray  # (B,)

    @property
    def num_trees(self) -> int:
        return self.visit_count.shape[0]

    @property
    def num_nodes(self) -> int:
        return self.visit_count.shape[1]

    @property
    def num_actions(self) -> int:
        return self.prior.shape[2]

    def node_value(self) -> jnp.ndarray:
        """(B, N) mean value; 0 for unvisited nodes (ptree_mz.py:176)."""
        return jnp.where(
            self.visit_count > 0,
            self.value_sum / jnp.maximum(self.visit_count, 1).astype(self.value_sum.dtype),
            0.0,
        )

def minmax_normalize(
    vmin: jnp.ndarray, vmax: jnp.ndarray, value_delta_max: float, q: jnp.ndarray
) -> jnp.ndarray:
    """Normalize q by per-tree (min, max) exactly as reference MinMaxStats
    (minimax.py:54-70): only when delta > 0; divide by max(delta,
    value_delta_max)."""
    extra = (1,) * (q.ndim - 1)
    delta = (vmax - vmin).reshape(vmin.shape[0], *extra)
    vmin_b = vmin.reshape(vmin.shape[0], *extra)
    denom = jnp.maximum(delta, value_delta_max)
    return jnp.where(delta > 0, (q - vmin_b) / denom, q)


def init_tree(
    batch_size: int,
    num_nodes: int,
    num_actions: int,
    embedding_example: Any,
    dtype=jnp.float32,
) -> Tree:
    """Allocate an empty batch of trees. ``embedding_example`` is a pytree of
    (B, ...) arrays giving per-node latent shapes/dtypes."""
    B, N, A = batch_size, num_nodes, num_actions

    def alloc_embedding(x):
        return jnp.zeros((B, N) + x.shape[1:], x.dtype)

    return Tree(
        visit_count=jnp.zeros((B, N), jnp.int32),
        value_sum=jnp.zeros((B, N), dtype),
        reward=jnp.zeros((B, N), dtype),
        raw_value=jnp.zeros((B, N), dtype),
        prior=jnp.zeros((B, N, A), dtype),
        children=jnp.full((B, N, A), UNVISITED, jnp.int32),
        to_play=jnp.full((B, N), -1, jnp.int32),
        terminal=jnp.zeros((B, N), bool),
        is_chance=jnp.zeros((B, N), bool),
        legal=jnp.zeros((B, N, A), bool),
        embedding=jax.tree_util.tree_map(alloc_embedding, embedding_example),
        # reference MinMaxStats.clear(): min=+1e6, max=-inf (minimax.py:46-52);
        # we use -1e6/+1e6-symmetric bounds: delta stays <= 0 until the first
        # update so normalization is off, matching behavior.
        vmin=jnp.full((B,), 1e6, dtype),
        vmax=jnp.full((B,), -1e6, dtype),
    )


def root_visit_counts(tree: Tree) -> jnp.ndarray:
    """(B, A) visit counts of root children (reference get_distributions,
    ptree_mz.py:133-150); 0 for never-expanded (virtual) children."""
    B = tree.num_trees
    bidx = jnp.arange(B)[:, None]
    rc = tree.children[:, 0, :]  # (B, A)
    safe = jnp.maximum(rc, 0)
    visits = tree.visit_count[bidx, safe]
    return jnp.where(rc >= 0, visits, 0)


def root_value(tree: Tree) -> jnp.ndarray:
    """(B,) root mean value. Note the reference root has visit_count =
    num_simulations + 1 (prepare adds 1, ptree_mz.py:242)."""
    return tree.value_sum[:, 0] / jnp.maximum(tree.visit_count[:, 0], 1).astype(
        tree.value_sum.dtype
    )


def root_children_values(tree: Tree, discount: float) -> jnp.ndarray:
    """(B, A) per-root-child Q = r + γ·V (0 if unvisited) — used by Gumbel
    policies as training targets (gumbel cnode get_children_values)."""
    B = tree.num_trees
    bidx = jnp.arange(B)[:, None]
    rc = tree.children[:, 0, :]
    safe = jnp.maximum(rc, 0)
    visits = tree.visit_count[bidx, safe]
    vals = tree.node_value()[bidx, safe]
    q = tree.reward[bidx, safe] + discount * vals
    return jnp.where((rc >= 0) & (visits > 0), q, 0.0)
