"""Loss landscape tests."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.unittest


def test_loss_surface(tmp_path):
    from lightzero_tpu.loss_landscape import loss_landscape_api, random_direction
    from lightzero_tpu.policy import MuZeroPolicy
    from lightzero_tpu.policy.muzero import TrainBatch

    cfg = MuZeroPolicy.default_config()
    cfg.model.latent_state_dim = 16
    cfg.model.support_scale = 5
    policy = MuZeroPolicy(cfg)
    state = policy.init_train_state(jax.random.PRNGKey(0))
    K = cfg.num_unroll_steps
    B = 4
    batch = TrainBatch(
        obs=jnp.ones((B, K + 1, 4)),
        actions=jnp.zeros((B, K), jnp.int32),
        mask=jnp.ones((B, K)),
        target_reward=jnp.zeros((B, K)),
        target_value=jnp.ones((B, K + 1)),
        target_policy=jnp.full((B, K + 1, 2), 0.5),
        weights=jnp.ones((B,)),
    )
    # one gradient step so the zero-init heads become non-degenerate
    state, _, _ = policy.forward_learn(state, batch)
    out = loss_landscape_api(policy, state.params, batch, str(tmp_path), mode="1d", steps=5)
    assert out["loss"].shape == (5,) and np.isfinite(out["loss"]).all()
    assert os.path.exists(tmp_path / "loss_surface_1d.npz")
    # center should be (weakly) a local structure: perturbed points differ
    assert not np.allclose(out["loss"], out["loss"][0])

    # filter normalization: direction leaf norms match param leaf norms
    d = random_direction(state.params, jax.random.PRNGKey(1))
    p_leaves = jax.tree_util.tree_leaves(state.params)
    d_leaves = jax.tree_util.tree_leaves(d)
    for p, dd in zip(p_leaves, d_leaves):
        pn = float(jnp.linalg.norm(p))
        # zero-init leaves get the epsilon floor (see core.random_direction)
        np.testing.assert_allclose(float(jnp.linalg.norm(dd)), max(pn, 1e-2), rtol=1e-3)

    out2 = loss_landscape_api(policy, state.params, batch, str(tmp_path), mode="2d", steps=3)
    assert out2["loss"].shape == (3, 3)
