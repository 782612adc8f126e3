"""Board-game symmetry augmentation for AlphaZero training data.

Role of the reference's ``get_augmented_data`` (lzero/mcts/utils.py:45):
each self-play sample (obs planes, visit-count policy, winner z) expands
into its dihedral-symmetry orbit — 8 transforms (4 rotations x mirror) for
square boards whose action space is the cell grid (tictactoe, gomoku, go;
a trailing pass action is transform-invariant), 2 transforms (identity +
horizontal mirror) for column games like connect4.

Numpy on the host replay path (like the reference): augmentation happens
once per collected sample, not inside the jitted train step.
"""
from __future__ import annotations

from typing import List, NamedTuple, Tuple

import numpy as np


class AugmentedSample(NamedTuple):
    obs: np.ndarray
    probs: np.ndarray
    z: float


def _transform_planes(obs: np.ndarray, k: int, mirror: bool) -> np.ndarray:
    """obs: (H, W, C) — rotate 90° k times then optionally mirror left-right."""
    out = np.rot90(obs, k, axes=(0, 1))
    if mirror:
        out = out[:, ::-1]
    return np.ascontiguousarray(out)


def _transform_grid_probs(probs: np.ndarray, h: int, w: int, k: int,
                          mirror: bool, has_pass: bool) -> np.ndarray:
    body = probs[: h * w].reshape(h, w)
    body = np.rot90(body, k, axes=(0, 1))
    if mirror:
        body = body[:, ::-1]
    flat = body.reshape(-1)
    if has_pass:
        flat = np.concatenate([flat, probs[h * w:]])
    return np.ascontiguousarray(flat.astype(probs.dtype))


def get_augmented_data(obs: np.ndarray, probs: np.ndarray, z: float) -> List[AugmentedSample]:
    """Expand one (obs, probs, z) sample into its symmetry orbit.

    obs: (H, W, C) board planes; probs: (A,) with A == H*W (cell actions),
    H*W + 1 (cells + pass), or W (column actions, e.g. connect4).
    Falls back to the identity-only orbit for non-symmetric action layouts.
    """
    h, w = int(obs.shape[0]), int(obs.shape[1])
    a = int(probs.shape[0])
    out: List[AugmentedSample] = []
    if h == w and a in (h * w, h * w + 1):
        has_pass = a == h * w + 1
        for mirror in (False, True):
            for k in range(4):
                out.append(AugmentedSample(
                    _transform_planes(obs, k, mirror),
                    _transform_grid_probs(probs, h, w, k, mirror, has_pass),
                    z,
                ))
    elif a == w:
        # column actions: only the left-right mirror preserves the game
        out.append(AugmentedSample(np.ascontiguousarray(obs), probs, z))
        out.append(AugmentedSample(
            np.ascontiguousarray(obs[:, ::-1]),
            np.ascontiguousarray(probs[::-1]),
            z,
        ))
    else:
        out.append(AugmentedSample(np.ascontiguousarray(obs), probs, z))
    return out
