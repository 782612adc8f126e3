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


def save_params_export(state: Any, path: str) -> str:
    """Durable params-only export next to the full TrainState checkpoint.

    Full checkpoints (params + target_params + 2x Adam moments) are large
    and gitignored, so they die with the sandbox; a params-only export is
    ~5x smaller and is what eval/deploy/warm-start actually need. The dict
    layout restores into any TrainState via ``load_checkpoint_lenient``
    (field-wise: params/target_params land, the fresh opt_state is kept) —
    the same semantics as the reference loading a ``model_path`` into a new
    learner (lzero/entry/train_muzero.py:96-98).
    """
    export = {"params": state.params}
    if hasattr(state, "target_params"):
        export["target_params"] = state.target_params
    return save_checkpoint(export, path)


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


def load_checkpoint_lenient(path: str, target: Any) -> Any:
    """Restore a TrainState-like pytree across OPTIMIZER-structure drift:
    warm-starting an old checkpoint after the optimizer changed (e.g. a new
    optax partition) fails a strict full-tree restore, but the params /
    target_params are still compatible. Falls back to restoring only the
    fields that match, keeping the target's fresh opt_state (a fresh
    optimizer over trained weights — same as the reference loading a
    model_path into a new learner, lzero/entry/train_muzero.py:96-98)."""
    try:
        return load_checkpoint(path, target=target)
    except Exception as e:  # structure mismatch: field-wise fallback
        import logging

        raw = load_checkpoint(path, target=None)
        # orbax restores a NamedTuple as a dict keyed by FIELD NAME; pickle
        # gives the sequence back. Align each field and keep the fresh
        # value where the saved subtree no longer unflattens into the
        # field's structure.
        fields = list(getattr(target, "_fields", ()))
        if isinstance(raw, (list, tuple)) and len(raw) == len(fields):
            raw = dict(zip(fields, raw))
        if not fields or not isinstance(raw, dict):
            raise e
        restored = target
        ok, failed = [], []
        for field in fields:
            if field not in raw:
                failed.append(field)
                continue
            tgt_field = getattr(target, field)
            try:
                sub = jax.tree_util.tree_unflatten(
                    jax.tree_util.tree_structure(tgt_field),
                    jax.tree_util.tree_leaves(raw[field]),
                )
                # leaf shapes must match too, or the field is stale
                jax.tree_util.tree_map(
                    lambda a, b: (_ for _ in ()).throw(
                        ValueError(f"shape {np.shape(a)} vs {np.shape(b)}")
                    )
                    if np.shape(a) != np.shape(b)
                    else None,
                    sub,
                    tgt_field,
                )
                restored = restored._replace(**{field: sub})
                ok.append(field)
            except Exception:
                failed.append(field)
        if "params" not in ok:
            raise e
        logging.warning(
            "load_checkpoint_lenient(%s): restored %s; kept fresh %s", path, ok, failed
        )
        return restored
