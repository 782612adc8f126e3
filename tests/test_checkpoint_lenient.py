"""load_checkpoint_lenient: warm-starting a checkpoint saved under a
DIFFERENT optimizer partition (e.g. after adding the dedicated log_alpha
Adam) must restore params/target_params/train_iter and keep the fresh
opt_state, instead of failing the strict full-tree restore."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from lightzero_tpu.policy.muzero import TrainState
from lightzero_tpu.utils.checkpoint import (
    load_checkpoint_lenient,
    save_checkpoint,
)

pytestmark = pytest.mark.unittest


def _params(val):
    return {"params": {"w": jnp.full((3, 2), val), "log_alpha": jnp.zeros(())}}


def test_lenient_restore_across_optimizer_drift(tmp_path):
    old_opt = optax.adamw(1e-3)
    p = _params(2.5)
    old_state = TrainState(
        params=p,
        target_params=_params(1.5),
        opt_state=old_opt.init(p),
        train_iter=jnp.asarray(123, jnp.int32),
    )
    path = str(tmp_path / "ckpt")
    save_checkpoint(old_state, path)

    # new optimizer: multi_transform partition -> different opt_state tree
    new_opt = optax.multi_transform(
        {"model": optax.adamw(1e-3), "alpha": optax.adam(1e-3)},
        lambda params: jax.tree_util.tree_map_with_path(
            lambda kp, _: "alpha"
            if any(getattr(k, "key", None) == "log_alpha" for k in kp)
            else "model",
            params,
        ),
    )
    fresh = TrainState(
        params=_params(0.0),
        target_params=_params(0.0),
        opt_state=new_opt.init(_params(0.0)),
        train_iter=jnp.asarray(0, jnp.int32),
    )
    restored = load_checkpoint_lenient(path, target=fresh)
    np.testing.assert_allclose(np.asarray(restored.params["params"]["w"]), 2.5)
    np.testing.assert_allclose(np.asarray(restored.target_params["params"]["w"]), 1.5)
    assert int(restored.train_iter) == 123
    # opt_state kept fresh (the new partition structure)
    assert jax.tree_util.tree_structure(restored.opt_state) == jax.tree_util.tree_structure(
        fresh.opt_state
    )


def test_lenient_restore_same_structure_is_strict(tmp_path):
    opt = optax.adamw(1e-3)
    p = _params(7.0)
    state = TrainState(
        params=p, target_params=p, opt_state=opt.init(p),
        train_iter=jnp.asarray(9, jnp.int32),
    )
    path = str(tmp_path / "ckpt2")
    save_checkpoint(state, path)
    fresh = TrainState(
        params=_params(0.0), target_params=_params(0.0),
        opt_state=opt.init(_params(0.0)), train_iter=jnp.asarray(0, jnp.int32),
    )
    restored = load_checkpoint_lenient(path, target=fresh)
    np.testing.assert_allclose(np.asarray(restored.params["params"]["w"]), 7.0)
    assert int(restored.train_iter) == 9
