"""Durable params-only exports (params_best): small enough to live in git,
restore into a fresh TrainState via load_checkpoint_lenient (params +
target_params land, fresh opt_state kept) — the warm-start semantics of the
reference's model_path loading (lzero/entry/train_muzero.py:96-98)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightzero_tpu.config import Config, compile_config
from lightzero_tpu.utils.checkpoint import (
    load_checkpoint_lenient,
    save_params_export,
)
from lightzero_tpu.utils.registry import POLICY_REGISTRY
import lightzero_tpu.policy  # noqa: F401

pytestmark = [pytest.mark.unittest]


def _policy():
    cfg = Config(dict(
        exp_name="/tmp/params_export_test",
        env=dict(type="cartpole"),
        policy=dict(
            type="muzero",
            model=dict(observation_shape=4, action_space_size=2,
                       model_type="mlp", latent_state_dim=16),
            num_simulations=4, batch_size=8,
        ),
    ))
    cls = POLICY_REGISTRY.get("muzero")
    pcfg = compile_config(cfg, cls.default_config(), 0, save_cfg=False).policy
    return cls(pcfg)


def test_params_export_roundtrip(tmp_path):
    pol = _policy()
    s1 = pol.init_train_state(jax.random.PRNGKey(0))
    # perturb params so the export differs from a fresh init
    s1 = s1._replace(
        params=jax.tree_util.tree_map(lambda a: a + 1.0, s1.params),
        train_iter=jnp.asarray(123, jnp.int32),
    )
    path = os.path.join(str(tmp_path), "params_best")
    save_params_export(s1, path)

    s2 = pol.init_train_state(jax.random.PRNGKey(1))
    restored = load_checkpoint_lenient(path, target=s2)
    a = jax.tree_util.tree_leaves(restored.params)
    b = jax.tree_util.tree_leaves(s1.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))
    # counters/opt_state stay fresh: the export is weights-only
    assert int(restored.train_iter) == int(s2.train_iter)


def test_params_export_is_small(tmp_path):
    pol = _policy()
    s1 = pol.init_train_state(jax.random.PRNGKey(0))
    full = os.path.join(str(tmp_path), "full")
    small = os.path.join(str(tmp_path), "small")
    from lightzero_tpu.utils.checkpoint import save_checkpoint

    save_checkpoint(s1, full)
    save_params_export(s1, small)

    def du(p):
        tot = 0
        for root, _, files in os.walk(p):
            tot += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        return tot or os.path.getsize(p + ".pkl")

    assert du(small) < 0.7 * du(full)
