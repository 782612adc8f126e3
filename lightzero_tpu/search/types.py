"""Shared types for the batched device-resident MCTS.

The search replaces the reference's C++ pointer trees + Python latent pools +
per-simulation GPU round trips (lzero/mcts/tree_search/mcts_ctree.py:293-366,
lzero/mcts/ctree/ctree_muzero/lib/cnode.cpp) with one jit-compiled function:
network inference and tree statistics live in the same XLA program, so a
whole batch of game trees advances in lockstep on-device.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SearchConfig:
    """Static search hyperparameters (pUCT constants from the reference
    default_config, lzero/policy/muzero.py:216-218 and cnode.cpp:655)."""

    num_simulations: int = 50
    pb_c_base: float = 19652.0
    pb_c_init: float = 1.25
    discount: float = 0.997
    value_delta_max: float = 0.01
    root_dirichlet_alpha: float = 0.3
    root_noise_weight: float = 0.25
    # 1 = single-player (play-with-bot), 2 = two-player self-play backup
    # (cnode.cpp:419-478 update_tree_q semantics).
    players: int = 1
    # 'noise': random tie-break among epsilon-close maxima (reference
    # cselect_child rand()%size, cnode.cpp:551). 'first': deterministic
    # lowest-index argmax, used for golden tests vs the ptree.
    tie_break: str = "noise"
    tie_break_epsilon: float = 1e-6
    # Stochastic MuZero: alternate decision/chance nodes; chance nodes
    # SAMPLE the child from the prior outcome distribution
    # (ctree_stochastic_muzero cnode.cpp:610-632).
    stochastic: bool = False
    # 'onehot' (default): one-hot contractions (einsum) that ride the MXU
    # instead of per-lane dynamic gathers — 13% faster on TPU at B=1024;
    # 'dynamic': plain dynamic-index gathers. Golden-tested identical.
    gather_mode: str = "onehot"
    # Pallas fused-traverse kernel (search/pallas_traverse.py): the whole
    # descent in ONE kernel with the packed table VMEM-resident. Applies
    # only to players==1, non-stochastic, non-reuse searches; other
    # configurations silently use the XLA path. Default off pending an
    # on-chip A/B measurement (LZT_PALLAS=1 in bench.py).
    use_pallas_traverse: bool = False


class RootOutput(NamedTuple):
    """Output of initial_inference at the roots (reference MZNetworkOutput,
    lzero/model/common.py:105)."""

    prior_logits: jnp.ndarray  # (B, A)
    value: jnp.ndarray  # (B,) scalar (already inverse-transformed)
    embedding: Any  # pytree of (B, ...) latent state(s)


class RecurrentOutput(NamedTuple):
    """Output of recurrent_inference for one search step.

    ``legal_mask`` supports env-as-simulator search (AlphaZero) and chance
    nodes; model-based algorithms pass all-True. ``terminal`` marks absorbing
    states (env-simulator search only; model-based passes all-False).
    """

    reward: jnp.ndarray  # (B,) scalar reward (or value_prefix for EZ)
    value: jnp.ndarray  # (B,) scalar value of the new node
    prior_logits: jnp.ndarray  # (B, A)
    embedding: Any  # pytree of (B, ...) next latent
    legal_mask: Optional[jnp.ndarray] = None  # (B, A) bool
    terminal: Optional[jnp.ndarray] = None  # (B,) bool
    is_chance: Optional[jnp.ndarray] = None  # (B,) bool new node is a chance node


# recurrent_fn(params, rng, action (B,), embedding pytree) -> RecurrentOutput
RecurrentFn = Callable[..., RecurrentOutput]


class SearchOutput(NamedTuple):
    visit_counts: jnp.ndarray  # (B, A) root child visit counts
    root_value: jnp.ndarray  # (B,) root mean value (visit-weighted)
    root_children_values: jnp.ndarray  # (B, A) per-child Q (0 if unvisited)
    improved_policy: Optional[jnp.ndarray]  # (B, A) (Gumbel only) else None
    tree: Any  # full Tree pytree for diagnostics / advanced targets
