"""Pallas TPU kernel: the whole pUCT traverse fused into ONE kernel.

STATUS (round 5): ARCHIVED — documented negative result. The on-chip A/B
(PALLAS_AB.json, round 4) measured this kernel at 0.73x the default XLA
path (3.27M vs 4.49M sims/s, B=1024/50 sims). The loss is structural, not
a layout bug: each pallas_call still round-trips the packed table through
HBM once per SIMULATION (the kernel only keeps it VMEM-resident across
depth levels within one traverse), while between traverses the
expand/backup/net steps run outside the kernel — so the table can never
stay resident across the 50-simulation loop without also fusing the
recurrent net and backup into the kernel (a full search rewrite, not a
tile-shape fix). The kernel remains exact-parity tested
(tests/test_pallas_traverse.py, interpret mode) and flag-gated OFF
(cfg.use_pallas_traverse); the XLA fused path is the production default.

The XLA `_traverse` (puct.py:266) is a `lax.while_loop` whose body does a
packed-table gather + UCB + argmax per depth level; every level round-trips
the (B, N, 7A+2) table through HBM between fused HLO ops. This kernel keeps
the packed table RESIDENT IN VMEM for the entire descent: one pallas_call
per simulation does all depth levels with zero HBM traffic beyond the
initial tile load and the (max_depth, B) path outputs.

Layout: everything in the kernel is TRANSPOSED — the batch (tree) index
lives on the LANE axis and the small structured dims (actions A, table
columns C, path depth D) live on sublanes / the outer 3D dim. Per-tree
scalars are (1, Bt) rows, so every broadcast replicates across sublanes —
the direction Mosaic supports natively. The batch-major (B, ...) layout
fails to lower: (Bt, 1) per-tree scalars need lane-replication relayouts
("Invalid relayout ... replicated in destination but not in source") and
bool loop carries hit an i8->i1 trunci Mosaic cannot lower for narrow
vectors — both caught via chipless AOT compiles, round 4. Loop-carried
flags are f32 0/1, never bool, for the same reason; path recordings are
dynamic SUBLANE stores (lane-dim dynamic stores need 128-multiples).

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
(N × C × Bt f32) stays within VMEM.
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
    budget. The gather's (N, 1, Bt) one-hot product materializes a second
    table-sized temporary, so the table itself gets ~2.5 MB of the 16 MB
    scoped-vmem limit (Bt=1024 at bench shapes allocated 20.7 MB and was
    rejected — chipless AOT, round 4)."""
    budget = int(2.5 * 1024 * 1024)
    per_row = N * C * 4
    bt = max(1, budget // per_row)
    for cand in (1024, 512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        if cand <= min(bt, B) and B % cand == 0:
            return cand
    return 1


def _traverse_kernel(
    # inputs (all batch-on-lanes)
    packed_ref,      # (N, C, Bt) f32
    vminmax_ref,     # (2, Bt) f32
    root_ref,        # (4, Bt) f32: reward0, vsum0, visit0, pad
    noise_ref,       # (D, A, Bt) f32 (all-zero when tie_break == 'first')
    # outputs
    scal_ref,        # (8, Bt) f32: node, parent, last_action, depth, leaf_term, pad…
    path_ref,        # (D, Bt) f32 node indices
    paction_ref,     # (D, Bt) f32
    preward_ref,     # (D, Bt) f32
    pvsum_ref,       # (D, Bt) f32
    pvisit_ref,      # (D, Bt) f32
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
    Bt = packed_ref.shape[-1]
    f32 = jnp.float32
    packed = packed_ref[:]                      # (N, C, Bt) — VMEM-resident
    vmin = vminmax_ref[0:1, :]                  # (1, Bt)
    vmax = vminmax_ref[1:2, :]

    # int32 iota: Mosaic's tpu.iota only lowers for integer result types
    # (a float iota fails TPU verification — caught on-chip, round 4)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (N, 1, Bt), 0)
    iota_a = jax.lax.broadcasted_iota(jnp.int32, (A, Bt), 0)

    # row 0 of the path recordings = the root's pre-backup stats
    zrow = jnp.zeros((1, Bt), f32)
    path_ref[0:1, :] = zrow
    paction_ref[0:1, :] = zrow
    preward_ref[0:1, :] = root_ref[0:1, :]
    pvsum_ref[0:1, :] = root_ref[1:2, :]
    pvisit_ref[0:1, :] = root_ref[2:3, :]

    def normalize(q):
        # minmax_normalize (tree.py:59): only when delta > 0
        delta = vmax - vmin
        denom = jnp.maximum(delta, value_delta_max)
        return jnp.where(delta > 0, (q - vmin) / denom, q)

    # All fori_loop-carried flags are f32 0/1, NOT bool (see module doc).
    def body(t, carry):
        node, parent_q, is_root, done, depth, parent, last_action, leaf_term = carry
        # carry entries are all (1, Bt) f32

        node_oh = (iota_n == node.astype(jnp.int32)[None]).astype(f32)  # (N,1,Bt)
        row = jnp.sum(packed * node_oh, axis=0)                    # (C, Bt)

        row_children = row[0:A, :]                                 # (A, Bt)
        prior = row[A:2 * A, :]
        legal = jnp.where(row[2 * A:3 * A, :] > 0.5, 1.0, 0.0)
        cvisit = row[3 * A:4 * A, :]
        cvsum = row[4 * A:5 * A, :]
        creward = row[5 * A:6 * A, :]
        cterm = jnp.where(row[6 * A:7 * A, :] > 0.5, 1.0, 0.0)
        parent_visit = row[7 * A:7 * A + 1, :]                     # (1, Bt)
        exists = jnp.where(row_children >= 0.0, 1.0, 0.0)
        has_visit = jnp.where(cvisit > 0, 1.0, 0.0)
        cvalue = jnp.where(exists * has_visit > 0.5,
                           cvsum / jnp.maximum(cvisit, 1.0), 0.0)
        cvisit = cvisit * exists
        creward = creward * exists

        # _mean_q (ptree_mz.py:88-115)
        visited = jnp.where(cvisit > 0, 1.0, 0.0) * legal          # (A, Bt)
        q_sa = creward + discount * cvalue
        total_q = jnp.sum(visited * q_sa, axis=0, keepdims=True)   # (1, Bt)
        total_n = jnp.sum(visited, axis=0, keepdims=True)
        root_mean = total_q / jnp.maximum(total_n, 1.0)
        mixed = (parent_q + total_q) / (total_n + 1.0)
        mean_q = jnp.where(is_root * jnp.where(total_n > 0, 1.0, 0.0) > 0.5,
                           root_mean, mixed)                       # (1, Bt)

        # _ucb_scores (ptree_mz.py:370-419), players == 1
        pb_c = (jnp.log((parent_visit + pb_c_base + 1.0) / pb_c_base) + pb_c_init)
        pb_c = pb_c * jnp.sqrt(parent_visit) / (cvisit + 1.0)      # (A, Bt)
        q = creward + discount * cvalue
        value_score = jnp.clip(normalize(q), 0.0, 1.0)
        pq = jnp.clip(normalize(mean_q), 0.0, 1.0)
        value_score = jnp.where(cvisit > 0, value_score, pq)
        scores = jnp.where(legal > 0.5, pb_c * prior + value_score, -jnp.inf)

        if tie_break_first:
            action = jnp.argmax(scores, axis=0, keepdims=True).astype(f32)
        else:
            max_s = jnp.max(scores, axis=0, keepdims=True)
            near = scores >= max_s - tie_break_epsilon
            u = noise_ref[t, :, :]                                 # (A, Bt)
            action = jnp.argmax(jnp.where(near, u, -jnp.inf), axis=0,
                                keepdims=True).astype(f32)

        action_oh = (iota_a == action.astype(jnp.int32)).astype(f32)  # (A, Bt)
        next_child = jnp.sum(row_children * action_oh, axis=0, keepdims=True)
        child_term = jnp.where(
            jnp.sum(cterm * action_oh, axis=0, keepdims=True) > 0.5, 1.0, 0.0)
        entered_reward = jnp.sum(creward * action_oh, axis=0, keepdims=True)
        entered_vsum = jnp.sum(cvsum * action_oh, axis=0, keepdims=True)
        entered_visit = jnp.sum(cvisit * action_oh, axis=0, keepdims=True)

        not_done = 1.0 - done
        absent = jnp.where(next_child < 0, 1.0, 0.0)
        now_done = not_done * jnp.maximum(absent, child_term)
        move = not_done * (1.0 - absent)

        new_depth = depth + move
        new_node = jnp.where(move > 0.5, next_child, node)

        # path row t+1 (written for every lane; backup masks by depth):
        # a dynamic SUBLANE store — supported, unlike dynamic lane offsets
        path_ref[pl.ds(t + 1, 1), :] = new_node
        paction_ref[pl.ds(t + 1, 1), :] = action
        preward_ref[pl.ds(t + 1, 1), :] = entered_reward
        pvsum_ref[pl.ds(t + 1, 1), :] = entered_vsum
        pvisit_ref[pl.ds(t + 1, 1), :] = entered_visit

        return (
            new_node,
            jnp.where(done > 0.5, parent_q, mean_q),
            is_root * done,
            jnp.maximum(done, now_done),
            new_depth,
            jnp.where(now_done * absent > 0.5, node, parent),
            jnp.where(done > 0.5, last_action, action),
            jnp.where(now_done > 0.5, child_term, leaf_term),
        )

    # Initial carries derive from a LOADED row, not jnp.zeros: a splat
    # constant init has fully-replicated layout {*,*} while the loop body
    # yields lane-mapped values ({*,0}), and Mosaic cannot relayout
    # {*,0} -> {*,*} ("Invalid relayout: non-singleton dim replicated in
    # destination but not in source" — chipless AOT, round 4).
    z = root_ref[3:4, :] * 0.0                  # (1, Bt), memory layout
    carry = (z, z, z + 1.0, z, z, z, z, z)
    node, _, _, _, depth, parent, last_action, leaf_term = jax.lax.fori_loop(
        0, max_depth - 1, body, carry
    )

    scal_ref[:, :] = jnp.concatenate(
        [node, parent, last_action, depth, leaf_term,
         jnp.zeros((3, Bt), f32)],
        axis=0,
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
    path_visit) — all f32, batch-major; the caller casts/round-trips to the
    _TraverseState layout. Internally everything runs batch-on-lanes (see
    module doc); the transposes in/out are cheap XLA copies next to the
    packed-table build."""
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
        jax.ShapeDtypeStruct((8, B), f32),
        jax.ShapeDtypeStruct((max_depth, B), f32),
        jax.ShapeDtypeStruct((max_depth, B), f32),
        jax.ShapeDtypeStruct((max_depth, B), f32),
        jax.ShapeDtypeStruct((max_depth, B), f32),
        jax.ShapeDtypeStruct((max_depth, B), f32),
    ]
    row_spec = lambda height: pl.BlockSpec(  # noqa: E731
        (height, Bt), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, C, Bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            row_spec(2),
            row_spec(4),
            pl.BlockSpec((max_depth, A, Bt), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[row_spec(8)] + [row_spec(max_depth)] * 5,
        out_shape=out_shapes,
        interpret=interpret,
    )(
        packed.astype(f32).transpose(1, 2, 0),
        jnp.stack([vmin, vmax], axis=0).astype(f32),
        root_stats.astype(f32).T,
        noise_u.astype(f32).transpose(0, 2, 1),
    )
    return tuple(o.T for o in outs)
