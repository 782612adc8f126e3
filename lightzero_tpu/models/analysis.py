"""Model-analysis metrics (reference lzero/model/utils.py:
calculate_dormant_ratio, compute_effective_rank,
compute_average_weight_magnitude — the tensorboard 'analysis' families,
SURVEY.md §5.5), as pure JAX functions."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def dormant_ratio(activations: jnp.ndarray, tau: float = 0.025) -> jnp.ndarray:
    """Fraction of dormant units: units whose mean |activation| is below
    ``tau`` × the layer-mean activation (Sokar et al., the reference's
    dormant-neuron metric). activations: (B, units)."""
    score = jnp.mean(jnp.abs(activations), axis=0)  # (units,)
    norm = score / jnp.maximum(jnp.mean(score), 1e-9)
    return jnp.mean((norm <= tau).astype(jnp.float32))


def effective_rank(features: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """exp(entropy of normalized singular values) of a feature batch
    (B, d) — the reference's effective-rank representational-collapse
    metric (world_model.py:1861-1913)."""
    f = features - jnp.mean(features, axis=0, keepdims=True)
    s = jnp.linalg.svd(f.astype(jnp.float32), compute_uv=False)
    p = s / jnp.maximum(jnp.sum(s), eps)
    entropy = -jnp.sum(jnp.where(p > eps, p * jnp.log(p), 0.0))
    return jnp.exp(entropy)


def average_weight_magnitude(params) -> jnp.ndarray:
    """Mean |w| over all parameters (compute_average_weight_magnitude)."""
    leaves = jax.tree_util.tree_leaves(params)
    total = sum(jnp.sum(jnp.abs(l)) for l in leaves)
    count = sum(l.size for l in leaves)
    return total / count


def latent_norm_stats(latent: jnp.ndarray) -> dict:
    """L2-norm statistics of a latent batch (the reference's latent-norm
    analysis logs, muzero.py:643-644)."""
    norms = jnp.linalg.norm(latent.reshape(latent.shape[0], -1), axis=-1)
    return dict(
        latent_norm_mean=jnp.mean(norms),
        latent_norm_max=jnp.max(norms),
        latent_norm_min=jnp.min(norms),
    )
