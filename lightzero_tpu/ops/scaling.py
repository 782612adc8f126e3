"""Value scaling transforms (MuZero Appendix F) as pure JAX functions.

Behavioral spec: reference lzero/policy/scaling_transform.py
(``scalar_transform`` :15, ``inverse_scalar_transform`` :33,
``phi_transform`` :111, ``visit_count_temperature`` :95,
``cross_entropy_loss`` :188). Golden-tested against those in
tests/test_scaling.py.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DiscreteSupport(NamedTuple):
    """Evenly spaced categorical value support [start, stop) with ``step``.

    Mirrors reference ``DiscreteSupport`` (scaling_transform.py:6) as a
    static, hashable description; ``arange`` is materialized on demand so the
    object itself can live in jitted-function closures.
    """

    start: float
    stop: float
    step: float = 1.0

    @property
    def size(self) -> int:
        return int((self.stop - self.start) / self.step + 1e-9)

    @property
    def arange(self) -> jnp.ndarray:
        return self.start + self.step * jnp.arange(self.size, dtype=jnp.float32)


def scalar_transform(x: jnp.ndarray, epsilon: float = 0.001, delta: float = 1.0) -> jnp.ndarray:
    """h(x) = sign(x)(sqrt(|x/δ|+1) − 1) + ε·x/δ  (value-compression transform)."""
    if delta != 1.0:
        x = x / delta
    return jnp.sign(x) * (jnp.sqrt(jnp.abs(x) + 1.0) - 1.0) + epsilon * x


def _h_inverse(value: jnp.ndarray, epsilon: float = 0.001) -> jnp.ndarray:
    tmp = (jnp.sqrt(1.0 + 4.0 * epsilon * (jnp.abs(value) + 1.0 + epsilon)) - 1.0) / (2.0 * epsilon)
    return jnp.sign(value) * (tmp * tmp - 1.0)


def logits_to_scalar(logits: jnp.ndarray, support: DiscreteSupport) -> jnp.ndarray:
    """Categorical logits (..., N) → expected support value (...,)."""
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.sum(probs * support.arange, axis=-1)


def inverse_scalar_transform(
    logits: jnp.ndarray,
    support: DiscreteSupport,
    epsilon: float = 0.001,
    categorical_distribution: bool = True,
) -> jnp.ndarray:
    """h⁻¹ of the (categorical) value head output → real-valued scalar (...,).

    Matches reference ``InverseScalarTransform.__call__``
    (scaling_transform.py:82): softmax·support expectation then h⁻¹.
    """
    if categorical_distribution:
        value = logits_to_scalar(logits, support)
    else:
        value = jnp.squeeze(logits, axis=-1) if logits.shape[-1] == 1 else logits
    return _h_inverse(value, epsilon)


def phi_transform(
    support: DiscreteSupport, x: jnp.ndarray, label_smoothing_eps: float = 0.0
) -> jnp.ndarray:
    """Real scalar (...,) → two-hot categorical target (..., N).

    Matches reference ``phi_transform`` (scaling_transform.py:111): clamp to
    support range, split mass linearly between the two nearest atoms,
    optional label smoothing.
    """
    size = support.size
    min_bound = support.start
    max_bound = support.start + support.step * (size - 1)
    x = jnp.clip(x, min_bound, max_bound)
    pos = (x - min_bound) / support.step
    low = jnp.floor(pos)
    p_high = pos - low
    p_low = 1.0 - p_high
    low_idx = low.astype(jnp.int32)
    high_idx = jnp.minimum(low_idx + 1, size - 1)
    one_hot_low = jax.nn.one_hot(low_idx, size, dtype=x.dtype)
    one_hot_high = jax.nn.one_hot(high_idx, size, dtype=x.dtype)
    target = one_hot_low * p_low[..., None] + one_hot_high * p_high[..., None]
    if label_smoothing_eps > 0:
        target = (1.0 - label_smoothing_eps) * target + label_smoothing_eps / size
    return target


def cross_entropy_loss(prediction: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """−Σ target·log_softmax(prediction) over the last axis (...,)."""
    return -jnp.sum(jax.nn.log_softmax(prediction, axis=-1) * target, axis=-1)


def visit_count_temperature(
    manual_temperature_decay: bool,
    fixed_temperature_value: float,
    threshold_training_steps_for_final_temperature: int,
    trained_steps: int,
) -> float:
    """Piecewise visit-softmax temperature schedule (scaling_transform.py:95)."""
    if manual_temperature_decay:
        if trained_steps < 0.5 * threshold_training_steps_for_final_temperature:
            return 1.0
        elif trained_steps < 0.75 * threshold_training_steps_for_final_temperature:
            return 0.5
        else:
            return 0.25
    return fixed_temperature_value
