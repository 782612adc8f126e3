"""Checkpoint save/restore (reference: ding BaseLearner ckpt hooks →
iteration_N.pth.tar + ckpt_best.pth.tar, SURVEY.md §5.4).

Uses orbax when available (the JAX-native checkpointing library), with a
numpy-pickle fallback so checkpoints never block training.
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import jax
import numpy as np


def _to_numpy(tree: Any) -> Any:
    return jax.tree_util.tree_map(np.asarray, tree)


def save_checkpoint(state: Any, path: str) -> str:
    """Save a pytree (e.g. TrainState) to ``path`` (directory for orbax,
    ``path + '.pkl'`` for the fallback). Returns the concrete path used."""
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, _to_numpy(state), force=True)
        return path
    except Exception:
        pkl = path + ".pkl"
        with open(pkl, "wb") as f:
            pickle.dump(_to_numpy(state), f)
        return pkl


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    path = os.path.abspath(path)
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        if target is not None:
            # restore INTO the target structure: orbax alone returns a
            # sorted nested dict whose leaf order need not match the
            # original pytree (NamedTuples, insertion-ordered dicts)
            restored = ckptr.restore(
                path, args=ocp.args.PyTreeRestore(item=_to_numpy(target))
            )
        else:
            restored = ckptr.restore(path)
    else:
        pkl = path if path.endswith(".pkl") else path + ".pkl"
        with open(pkl, "rb") as f:
            restored = pickle.load(f)
    if target is not None:
        restored = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(target), jax.tree_util.tree_leaves(restored)
        )
    return restored
