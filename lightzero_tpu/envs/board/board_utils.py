"""Generic vectorized board-game kernels.

Replaces the reference's per-game Cython win-check/legal-move kernels
(zoo/board_games/*/envs/*_cython.pyx) with one pattern: precompute all
winning lines as static (L, n) index arrays (numpy, at env construction),
then win detection = one gather + reduction, fully jittable and batched.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def make_lines(h: int, w: int, n: int) -> np.ndarray:
    """All length-n straight lines on an h×w board, as flat indices (L, n)."""
    lines = []
    for r in range(h):
        for c in range(w):
            for dr, dc in ((0, 1), (1, 0), (1, 1), (1, -1)):
                rr, cc = r + (n - 1) * dr, c + (n - 1) * dc
                if 0 <= rr < h and 0 <= cc < w:
                    lines.append([(r + i * dr) * w + (c + i * dc) for i in range(n)])
    return np.asarray(lines, np.int32)


def wins(board_flat: jnp.ndarray, lines: jnp.ndarray, player: jnp.ndarray) -> jnp.ndarray:
    """True iff any line is fully owned by ``player``."""
    vals = board_flat[lines]  # (L, n)
    return jnp.any(jnp.all(vals == player.astype(board_flat.dtype), axis=1))


def would_win(board_flat: jnp.ndarray, lines: jnp.ndarray, player: jnp.ndarray) -> jnp.ndarray:
    """(cells,) bool: placing ``player`` at each empty cell completes a line
    (vectorized win-in-1 detection for rule bots)."""
    vals = board_flat[lines]  # (L, n)
    p = player.astype(board_flat.dtype)
    own = (vals == p).sum(axis=1)
    empty_cnt = (vals == 0).sum(axis=1)
    critical = (own == lines.shape[1] - 1) & (empty_cnt == 1)  # (L,)
    # scatter: a cell is winning iff it is the empty cell of a critical line
    cell_mask = jnp.zeros((board_flat.shape[0],), bool)
    is_empty = vals == 0  # (L, n)
    contrib = critical[:, None] & is_empty  # (L, n)
    cell_mask = cell_mask.at[lines.reshape(-1)].max(contrib.reshape(-1))
    return cell_mask & (board_flat == 0)
