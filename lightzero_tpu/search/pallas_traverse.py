"""Pallas TPU kernel: the whole pUCT traverse fused into ONE kernel.

The XLA `_traverse` (puct.py:266) is a `lax.while_loop` whose body does a
packed-table gather + UCB + argmax per depth level; every level round-trips
the (B, N, 7A+2) table through HBM between fused HLO ops. This kernel keeps
the packed table RESIDENT IN VMEM for the entire descent: one pallas_call
per simulation does all depth levels with zero HBM traffic beyond the
initial tile load and the (B, max_depth) path outputs.

Scope (the flag-gated fast path; everything else falls back to XLA):
  - players == 1 (single-player backup semantics — the bench path and all
    non-self-play envs),
  - non-stochastic trees, no ReZero reuse-search,
  - both tie-break modes ('first' and 'noise' — the noise table is
    pregenerated outside, exactly like the XLA path).

Semantics mirror puct.py:_traverse / _mean_q / _ucb_scores (reference
ptree_mz.py:88-115, 370-419) op for op; tests/test_pallas_traverse.py
asserts exact output parity against the XLA implementation in interpret
mode. On a v5e the grid tiles the batch so a tile's packed table
(Bt × N × (7A+2) f32) stays within VMEM.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(B: int, N: int, C: int) -> int:
    """Largest batch tile whose packed block fits a conservative VMEM
    budget (~6 MB for the table, leaving room for temporaries)."""
    budget = 6 * 1024 * 1024
    per_row = N * C * 4
    bt = max(1, budget // per_row)
    for cand in (1024, 512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        if cand <= min(bt, B) and B % cand == 0:
            return cand
    return 1


def _traverse_kernel(
    # inputs
    packed_ref,      # (Bt, N, C) f32
    vminmax_ref,     # (Bt, 2) f32
    root_ref,        # (Bt, 4) f32: reward0, vsum0, visit0, pad
    noise_ref,       # (D, Bt, A) f32 (all-zero when tie_break == 'first')
    # outputs
    scal_ref,        # (Bt, 8) f32: node, parent, last_action, depth, leaf_term, pad…
    path_ref,        # (Bt, D) f32 node indices
    paction_ref,     # (Bt, D) f32
    preward_ref,     # (Bt, D) f32
    pvsum_ref,       # (Bt, D) f32
    pvisit_ref,      # (Bt, D) f32
    *,
    A: int,
    N: int,
    max_depth: int,
    discount: float,
    pb_c_base: float,
    pb_c_init: float,
    value_delta_max: float,
    tie_break_first: bool,
    tie_break_epsilon: float,
):
    Bt = packed_ref.shape[0]
    f32 = jnp.float32
    packed = packed_ref[:]                      # (Bt, N, C) — VMEM-resident
    vmin = vminmax_ref[:, 0:1]                  # (Bt, 1)
    vmax = vminmax_ref[:, 1:2]

    # int32 iota: Mosaic's tpu.iota only lowers for integer result types
    # (a float iota fails TPU verification — caught on-chip, round 4)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (Bt, N), 1)
    iota_a = jax.lax.broadcasted_iota(jnp.int32, (Bt, A), 1)
    # column iota over the path recordings: Mosaic cannot store a single
    # dynamic column into the 128-lane dim ("index in dimension 1 must be
    # a multiple of 128" — caught on-chip, round 4), so every per-step
    # write below is a one-hot masked full-row read-modify-write
    Dmax = path_ref.shape[1]
    iota_d = jax.lax.broadcasted_iota(jnp.int32, (Bt, Dmax), 1)

    # column 0 of the path recordings = the root's pre-backup stats
    col0 = iota_d == 0
    zrow = jnp.zeros((Bt, Dmax), f32)
    path_ref[:, :] = zrow
    paction_ref[:, :] = zrow
    preward_ref[:, :] = jnp.where(col0, root_ref[:, 0:1], 0.0)
    pvsum_ref[:, :] = jnp.where(col0, root_ref[:, 1:2], 0.0)
    pvisit_ref[:, :] = jnp.where(col0, root_ref[:, 2:3], 0.0)

    def normalize(q):
        # minmax_normalize (tree.py:59): only when delta > 0
        delta = vmax - vmin
        denom = jnp.maximum(delta, value_delta_max)
        return jnp.where(delta > 0, (q - vmin) / denom, q)

    def body(t, carry):
        node, parent_q, is_root, done, depth, parent, last_action, leaf_term = carry

        node_oh = (iota_n == node.astype(jnp.int32)).astype(f32)   # (Bt, N)
        row = jnp.sum(packed * node_oh[:, :, None], axis=1)        # (Bt, C)

        row_children = row[:, 0:A]
        prior = row[:, A:2 * A]
        legal = row[:, 2 * A:3 * A] > 0.5
        cvisit = row[:, 3 * A:4 * A]
        cvsum = row[:, 4 * A:5 * A]
        creward = row[:, 5 * A:6 * A]
        cterm = row[:, 6 * A:7 * A] > 0.5
        parent_visit = row[:, 7 * A:7 * A + 1]                      # (Bt, 1)
        exists = row_children >= 0.0
        cvalue = jnp.where(exists & (cvisit > 0), cvsum / jnp.maximum(cvisit, 1.0), 0.0)
        cvisit = jnp.where(exists, cvisit, 0.0)
        creward = jnp.where(exists, creward, 0.0)

        # _mean_q (ptree_mz.py:88-115)
        visited = (cvisit > 0) & legal
        q_sa = creward + discount * cvalue
        total_q = jnp.sum(jnp.where(visited, q_sa, 0.0), axis=1, keepdims=True)
        total_n = jnp.sum(visited.astype(f32), axis=1, keepdims=True)
        root_mean = total_q / jnp.maximum(total_n, 1.0)
        mixed = (parent_q + total_q) / (total_n + 1.0)
        mean_q = jnp.where(is_root & (total_n > 0), root_mean, mixed)  # (Bt, 1)

        # _ucb_scores (ptree_mz.py:370-419), players == 1
        pb_c = (jnp.log((parent_visit + pb_c_base + 1.0) / pb_c_base) + pb_c_init)
        pb_c = pb_c * jnp.sqrt(parent_visit) / (cvisit + 1.0)
        q = creward + discount * cvalue
        value_score = jnp.clip(normalize(q), 0.0, 1.0)
        pq = jnp.clip(normalize(mean_q), 0.0, 1.0)
        value_score = jnp.where(cvisit > 0, value_score, pq)
        scores = jnp.where(legal, pb_c * prior + value_score, -jnp.inf)

        if tie_break_first:
            action = jnp.argmax(scores, axis=1, keepdims=True).astype(f32)
        else:
            max_s = jnp.max(scores, axis=1, keepdims=True)
            near = scores >= max_s - tie_break_epsilon
            u = noise_ref[pl.ds(t, 1), :, :].reshape(Bt, A)
            action = jnp.argmax(jnp.where(near, u, -jnp.inf), axis=1,
                                keepdims=True).astype(f32)

        action_oh = (iota_a == action.astype(jnp.int32)).astype(f32)  # (Bt, A)
        next_child = jnp.sum(row_children * action_oh, axis=1, keepdims=True)
        child_term = jnp.sum(cterm.astype(f32) * action_oh, axis=1, keepdims=True) > 0.5
        entered_reward = jnp.sum(creward * action_oh, axis=1, keepdims=True)
        entered_vsum = jnp.sum(cvsum * action_oh, axis=1, keepdims=True)
        entered_visit = jnp.sum(cvisit * action_oh, axis=1, keepdims=True)

        now_done = (~done) & ((next_child < 0) | child_term)
        move = (~done) & (next_child >= 0)

        new_depth = jnp.where(move, depth + 1.0, depth)
        new_node = jnp.where(move, next_child, node)

        # path column t+1 (written for every lane; backup masks by depth);
        # one-hot full-row RMW — see iota_d note above
        oh_col = iota_d == (t + 1)
        path_ref[:, :] = jnp.where(oh_col, new_node, path_ref[:, :])
        paction_ref[:, :] = jnp.where(oh_col, action.astype(f32), paction_ref[:, :])
        preward_ref[:, :] = jnp.where(oh_col, entered_reward, preward_ref[:, :])
        pvsum_ref[:, :] = jnp.where(oh_col, entered_vsum, pvsum_ref[:, :])
        pvisit_ref[:, :] = jnp.where(oh_col, entered_visit, pvisit_ref[:, :])

        return (
            new_node,
            jnp.where(done, parent_q, mean_q),
            is_root & done,
            done | now_done,
            new_depth,
            jnp.where(now_done & (next_child < 0), node, parent),
            jnp.where(done, last_action, action),
            jnp.where(now_done, child_term, leaf_term),
        )

    z = jnp.zeros((Bt, 1), f32)
    carry = (z, z, jnp.ones((Bt, 1), bool), jnp.zeros((Bt, 1), bool), z, z, z,
             jnp.zeros((Bt, 1), bool))
    node, _, _, _, depth, parent, last_action, leaf_term = jax.lax.fori_loop(
        0, max_depth - 1, body, carry
    )

    # single aligned full-row store (static narrow column stores at
    # offsets 1..7 would hit the same lane-alignment constraint)
    scal_ref[:, :] = jnp.concatenate(
        [node, parent, last_action, depth, leaf_term.astype(f32),
         jnp.zeros((Bt, 3), f32)],
        axis=1,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "A", "N", "max_depth", "discount", "pb_c_base", "pb_c_init",
        "value_delta_max", "tie_break_first", "tie_break_epsilon", "interpret",
    ),
)
def pallas_traverse(
    packed: jnp.ndarray,       # (B, N, C) any float dtype
    vmin: jnp.ndarray,         # (B,)
    vmax: jnp.ndarray,         # (B,)
    root_stats: jnp.ndarray,   # (B, 4) reward0, vsum0, visit0, pad
    noise_u: Optional[jnp.ndarray],  # (D, B, A) or None
    *,
    A: int,
    N: int,
    max_depth: int,
    discount: float,
    pb_c_base: float,
    pb_c_init: float,
    value_delta_max: float,
    tie_break_first: bool,
    tie_break_epsilon: float,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Returns (scalars (B, 8), path, path_action, path_reward, path_vsum,
    path_visit) — all f32; the caller casts/round-trips to the
    _TraverseState layout."""
    B = packed.shape[0]
    C = packed.shape[2]
    Bt = _pick_tile(B, N, C)
    grid = (B // Bt,)
    f32 = jnp.float32
    if noise_u is None:
        noise_u = jnp.zeros((max_depth, B, A), f32)

    kernel = functools.partial(
        _traverse_kernel,
        A=A, N=N, max_depth=max_depth, discount=discount,
        pb_c_base=pb_c_base, pb_c_init=pb_c_init,
        value_delta_max=value_delta_max,
        tie_break_first=tie_break_first,
        tie_break_epsilon=tie_break_epsilon,
    )
    out_shapes = [
        jax.ShapeDtypeStruct((B, 8), f32),
        jax.ShapeDtypeStruct((B, max_depth), f32),
        jax.ShapeDtypeStruct((B, max_depth), f32),
        jax.ShapeDtypeStruct((B, max_depth), f32),
        jax.ShapeDtypeStruct((B, max_depth), f32),
        jax.ShapeDtypeStruct((B, max_depth), f32),
    ]
    row_spec = lambda width: pl.BlockSpec(  # noqa: E731
        (Bt, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Bt, N, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            row_spec(2),
            row_spec(4),
            pl.BlockSpec((max_depth, Bt, A), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[row_spec(8)] + [row_spec(max_depth)] * 5,
        out_shape=out_shapes,
        interpret=interpret,
    )(
        packed.astype(f32),
        jnp.stack([vmin, vmax], axis=1).astype(f32),
        root_stats.astype(f32),
        noise_u.astype(f32),
    )
