"""Env wrappers for pure-JAX envs.

The reference's multitask entries pad observations so heterogeneous games
share one model (padded Atari frames,
train_unizero_multitask_segment_ddp.py); ``PadVectorObs`` is the vector-obs
equivalent, letting e.g. pendulum (3-dim) and cartpole (4-dim) share a
multitask world model.
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
