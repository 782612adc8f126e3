"""Action selection from root visit counts + gradient-scaling helper.

Behavioral spec: reference ``select_action`` (lzero/policy/utils.py:633) —
temperature-annealed visit-count distribution, argmax when deterministic,
categorical sample otherwise; entropy of the distribution is returned for
monitoring. Implemented batched over roots (the reference loops per env).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def sample_from_visit_counts(
    rng: jax.Array,
    visit_counts: jnp.ndarray,
    temperature: jnp.ndarray | float = 1.0,
    deterministic: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched action selection.

    Args:
        visit_counts: (B, A) float or int visit counts (illegal actions = 0).
        temperature: scalar visit-softmax temperature.
    Returns:
        (actions (B,), entropy (B,) in bits).
    """
    counts = visit_counts.astype(jnp.float32)
    logits = jnp.where(counts > 0, jnp.log(jnp.maximum(counts, 1e-30)), -jnp.inf)
    logits = logits / jnp.asarray(temperature, jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    ent = -jnp.sum(jnp.where(probs > 0, probs * jnp.log2(jnp.maximum(probs, 1e-30)), 0.0), axis=-1)
    if deterministic:
        actions = jnp.argmax(counts, axis=-1)
    else:
        actions = jax.random.categorical(rng, logits, axis=-1)
    return actions, ent


# host-side convenience mirroring the reference single-root API
def select_action(visit_counts, temperature: float = 1.0, deterministic: bool = True, rng=None):
    import numpy as np

    counts = np.asarray(visit_counts, dtype=np.float64)
    powed = counts ** (1.0 / temperature)
    probs = powed / powed.sum()
    if deterministic:
        action = int(np.argmax(counts))
    else:
        rng = rng or np.random
        action = int(rng.choice(len(counts), p=probs))
    nz = probs[probs > 0]
    ent = float(-(nz * np.log2(nz)).sum())
    return action, ent


@jax.custom_vjp
def scale_gradient(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Identity forward, gradient scaled by ``scale`` backward.

    Used for the reference's latent-gradient halving between unroll steps and
    the 1/num_unroll_steps loss rescale (lzero/policy/muzero.py:584-585).
    """
    return x


def _scale_gradient_fwd(x, scale):
    return x, scale


def _scale_gradient_bwd(scale, g):
    return (g * scale, None)


scale_gradient.defvjp(_scale_gradient_fwd, _scale_gradient_bwd)
