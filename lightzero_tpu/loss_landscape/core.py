"""Loss-landscape visualization core.

Capability-parity rebuild of reference lzero/loss_landscape/ (directions
with filter normalization, core/direction.py:242-284; perturbation +
1D/2D surface evaluation, core/perturbation.py:29; loss_landscape_api):
evaluate the training loss on a fixed batch at params + α·d₁ (+ β·d₂)
over a grid, with per-leaf ("filter") normalized random directions.
Surfaces are returned as arrays and saved as .npz (plot with matplotlib or
export to paraview downstream)."""
from __future__ import annotations

import os
from typing import Callable, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def random_direction(params, rng: jax.Array, norm: str = "filter"):
    """Random pytree direction with the reference's filter normalization
    (each leaf rescaled to the norm of the corresponding param leaf)."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rngs = jax.random.split(rng, len(leaves))
    out = []
    for leaf, r in zip(leaves, rngs):
        d = jax.random.normal(r, leaf.shape, jnp.float32)
        if norm == "filter":
            # NOTE: zero-initialized leaves (the zero-init output heads) get
            # a small epsilon scale instead of exactly 0 — otherwise the
            # surface at an untrained checkpoint is perfectly flat.
            scale = jnp.maximum(jnp.linalg.norm(leaf.astype(jnp.float32)), 1e-2)
            d = d * (scale / jnp.maximum(jnp.linalg.norm(d), 1e-10))
        elif norm == "layer":
            d = d / jnp.maximum(jnp.linalg.norm(d), 1e-10)
        out.append(d.astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


def _perturb(params, direction, alpha):
    return jax.tree_util.tree_map(lambda p, d: p + alpha * d, params, direction)


def loss_surface_1d(
    loss_fn: Callable, params, direction, alphas: Sequence[float]
) -> np.ndarray:
    """loss(params + α·d) for each α. ``loss_fn(params) -> scalar``."""

    @jax.jit
    def at(alpha):
        return loss_fn(_perturb(params, direction, alpha))

    return np.asarray([float(at(jnp.asarray(a, jnp.float32))) for a in alphas])


def loss_surface_2d(
    loss_fn: Callable, params, d1, d2, alphas: Sequence[float], betas: Sequence[float]
) -> np.ndarray:
    """(len(alphas), len(betas)) grid of loss(params + α·d1 + β·d2)."""

    @jax.jit
    def at(alpha, beta):
        p = jax.tree_util.tree_map(
            lambda p, a, b: p + alpha * a + beta * b, params, d1, d2
        )
        return loss_fn(p)

    grid = np.zeros((len(alphas), len(betas)))
    for i, a in enumerate(alphas):
        for j, b in enumerate(betas):
            grid[i, j] = float(at(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)))
    return grid


def loss_landscape_api(
    policy,
    params,
    batch,
    out_dir: str,
    mode: str = "2d",
    span: float = 1.0,
    steps: int = 11,
    rng: Optional[jax.Array] = None,
    render: bool = True,
) -> dict:
    """Compute and save the loss surface around ``params`` on ``batch``
    (role of reference loss_landscape_api +
    train_unizero_with_loss_landscape's post-training phase)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    def loss_fn(p):
        loss, _ = policy._loss_fn(p, batch)
        return loss

    os.makedirs(out_dir, exist_ok=True)
    alphas = np.linspace(-span, span, steps)
    r1, r2 = jax.random.split(rng)
    d1 = random_direction(params, r1)
    if mode == "1d":
        surface = loss_surface_1d(loss_fn, params, d1, alphas)
        np.savez(os.path.join(out_dir, "loss_surface_1d.npz"), alphas=alphas, loss=surface)
        out = dict(alphas=alphas, loss=surface)
    else:
        d2 = random_direction(params, r2)
        surface = loss_surface_2d(loss_fn, params, d1, d2, alphas, alphas)
        np.savez(
            os.path.join(out_dir, "loss_surface_2d.npz"), alphas=alphas, betas=alphas, loss=surface
        )
        out = dict(alphas=alphas, betas=alphas, loss=surface)
    if render:  # PNG + ParaView VTK (reference landscape_plots + h5->vtp)
        try:
            from lightzero_tpu.loss_landscape.plots import render_landscape_dir

            out["rendered"] = render_landscape_dir(out_dir)
        except Exception:  # rendering is never allowed to kill a run
            out["rendered"] = []
    return out
