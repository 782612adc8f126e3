"""Env wrappers for pure-JAX envs.

The reference's multitask entries pad observations so heterogeneous games
share one model (padded Atari frames,
train_unizero_multitask_segment_ddp.py); ``PadVectorObs`` is the vector-obs
equivalent, letting e.g. pendulum (3-dim) and cartpole (4-dim) share a
multitask world model.

``DiscretizeAction`` is the generic continuous->discrete action binning
wrapper (reference lzero/envs/wrappers/action_discretization_env_wrapper.py)
so any continuous env can be driven by the discrete MuZero/EZ families
without a per-env ``discrete_bins`` hack.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

from lightzero_tpu.envs.base import EnvStep, JaxEnv


class PadVectorObs(JaxEnv):
    """Zero-pad a wrapped env's vector observation to ``target_dim``."""

    def __init__(self, env: JaxEnv, target_dim: int):
        assert not isinstance(env.observation_shape, (tuple, list)), "vector envs only"
        assert int(env.observation_shape) <= target_dim
        self.env = env
        self._pad = target_dim - int(env.observation_shape)
        self.observation_shape = target_dim
        self.action_space_size = env.action_space_size
        self.num_players = env.num_players

    def _pad_obs(self, obs: jnp.ndarray) -> jnp.ndarray:
        return jnp.concatenate([obs, jnp.zeros(obs.shape[:-1] + (self._pad,), obs.dtype)], -1)

    def reset(self, rng: jax.Array) -> Tuple[Any, jnp.ndarray]:
        s, obs = self.env.reset(rng)
        return s, self._pad_obs(obs)

    def step(self, state: Any, action: jnp.ndarray, rng: jax.Array) -> EnvStep:
        out = self.env.step(state, action, rng)
        return out._replace(obs=self._pad_obs(out.obs))

    def legal_mask(self, state: Any) -> jnp.ndarray:
        return self.env.legal_mask(state)

    def initial_to_play(self, state: Any) -> jnp.ndarray:
        return self.env.initial_to_play(state)


class DiscretizeAction(JaxEnv):
    """Expose a continuous env (normalized [-1, 1]^d actions) as a discrete
    env with ``bins**d`` joint actions.

    Serves the same role as the reference's
    lzero/envs/wrappers/action_discretization_env_wrapper.py: each dimension
    is binned uniformly and the discrete action indexes the cartesian
    product (row-major, last dim fastest). Intentional deviation: bin
    levels are the full-range symmetric ``linspace(-1, 1, bins)`` (both
    endpoints included, matching this repo's PendulumEnv ``discrete_bins``
    path), whereas the reference maps ``k -> -1 + (2/n)*k`` and never emits
    +1. Full-range levels keep max-torque actions reachable.
    """

    continuous = False

    def __init__(self, env: JaxEnv, bins: int):
        assert getattr(env, "continuous", False), "DiscretizeAction wraps continuous envs"
        assert bins >= 2
        self.env = env
        self.bins = bins
        self.action_dim = int(env.action_space_size)  # continuous convention: size == dim
        self.action_space_size = bins**self.action_dim
        self.observation_shape = env.observation_shape
        self.num_players = env.num_players
        # per-dim bin centers over the normalized range
        self._levels = jnp.linspace(-1.0, 1.0, bins)

    def _to_continuous(self, action: jnp.ndarray) -> jnp.ndarray:
        idx = jnp.asarray(action, jnp.int32).reshape(())
        digits = []
        for d in range(self.action_dim - 1, -1, -1):
            digits.append(idx % self.bins)
            idx = idx // self.bins
        digits = jnp.stack(digits[::-1])  # first dim is the slowest-varying
        return self._levels[digits]

    def reset(self, rng: jax.Array) -> Tuple[Any, jnp.ndarray]:
        return self.env.reset(rng)

    def step(self, state: Any, action: jnp.ndarray, rng: jax.Array) -> EnvStep:
        cont = self._to_continuous(action)
        if self.action_dim == 1:
            cont = cont.reshape(())
        out = self.env.step(state, cont, rng)
        # the inner continuous env reports legal_mask with ITS action shape
        # ((action_dim,)); collector/evaluator scans carry step.legal_mask
        # whose initial carry is this wrapper's (bins**d,) mask, so rewrite
        # it to the discrete width to keep the scan carry shape-stable
        return out._replace(legal_mask=jnp.ones((self.action_space_size,), bool))

    def legal_mask(self, state: Any) -> jnp.ndarray:
        return jnp.ones((self.action_space_size,), bool)

    def initial_to_play(self, state: Any) -> jnp.ndarray:
        return self.env.initial_to_play(state)
