"""Loss landscape tests."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [pytest.mark.unittest, pytest.mark.slow]  # compile-heavy: not in the fast tier


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

def test_plots_and_vtk_export(tmp_path):
    """Rendering + ParaView export + trajectory projection need no jit: run
    them on synthetic surfaces (reference landscape_plots / h52vtp role)."""
    from lightzero_tpu.loss_landscape import (
        export_vtk,
        pca_directions,
        plot_1d,
        plot_2d_contour,
        project_trajectory,
        render_landscape_dir,
        unflatten_like,
    )

    alphas = np.linspace(-1, 1, 7)
    loss1 = alphas**2 + 1.0
    p = plot_1d(alphas, loss1, str(tmp_path / "l1.png"))
    assert os.path.getsize(p) > 1000

    betas = np.linspace(-1, 1, 5)
    loss2 = alphas[:, None] ** 2 + 2.0 * betas[None, :] ** 2 + 1.0
    traj = np.array([[0.8, 0.7], [0.4, 0.3], [0.05, 0.02]])
    p2 = plot_2d_contour(alphas, betas, loss2, str(tmp_path / "l2.png"), trajectory=traj)
    assert os.path.getsize(p2) > 1000

    v = export_vtk(alphas, betas, loss2, str(tmp_path / "l2.vtk"))
    txt = open(v).read()
    assert "STRUCTURED_GRID" in txt and f"POINTS {7*5} double" in txt
    assert "SCALARS loss double 1" in txt

    # npz -> renders
    np.savez(tmp_path / "loss_surface_2d.npz", alphas=alphas, betas=betas, loss=loss2)
    np.savez(tmp_path / "loss_surface_1d.npz", alphas=alphas, loss=loss1)
    produced = render_landscape_dir(str(tmp_path))
    assert len(produced) == 3 and all(os.path.exists(q) for q in produced)

    # PCA directions + trajectory projection on a toy "checkpoint" pytree
    final = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((4,))}
    ckpts = [
        jax.tree_util.tree_map(lambda x, s=s: x + s, final) for s in (0.9, 0.5, 0.1)
    ]
    d1, d2, var = pca_directions(ckpts, final)
    assert d1.shape == (10,) and var[0] > 0.99  # rank-1 trajectory
    coords = project_trajectory(ckpts, final, d1, d2)
    assert coords.shape == (3, 2)
    # offsets are all-ones*s: |alpha| must shrink monotonically along training
    assert abs(coords[0, 0]) > abs(coords[1, 0]) > abs(coords[2, 0])
    # unflatten round-trips shapes/dtypes
    tree = unflatten_like(d1, final)
    assert tree["w"].shape == (2, 3) and tree["b"].shape == (4,)
