"""Pendulum-v1 as a pure JAX env (classic gym dynamics; reference wraps gym
via zoo/classic_control/pendulum/envs/pendulum_lightzero_env.py).

Continuous action in [-2, 2]; also exposes a discretized variant
(``manually_discretization`` in the reference) via ``discrete_bins``.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from lightzero_tpu.envs.base import EnvStep, JaxEnv
from lightzero_tpu.utils import ENV_REGISTRY

MAX_SPEED = 8.0
MAX_TORQUE = 2.0
DT = 0.05
G = 10.0
M = 1.0
L = 1.0


class PendulumState(NamedTuple):
    theta: jnp.ndarray
    theta_dot: jnp.ndarray
    t: jnp.ndarray


def _angle_normalize(x):
    return ((x + jnp.pi) % (2 * jnp.pi)) - jnp.pi


@ENV_REGISTRY.register("pendulum")
class PendulumEnv(JaxEnv):
    observation_shape = 3
    action_space_size = 1  # continuous dim
    continuous = True
    num_players = 1

    def __init__(
        self,
        max_episode_steps: int = 200,
        discrete_bins: int = 0,
        gravity: float = G,
        max_torque: float = MAX_TORQUE,
    ):
        """``gravity`` / ``max_torque`` parameterize dynamics variants for
        multitask suites (the ScaleZero setting trains one policy across
        related control tasks; reference DMC task lists,
        train_unizero_multitask_balance_segment_ddp.py)."""
        self.max_episode_steps = max_episode_steps
        self.discrete_bins = discrete_bins  # 0 = continuous
        self.gravity = float(gravity)
        self.max_torque = float(max_torque)
        if discrete_bins:
            self.action_space_size = discrete_bins
            self.continuous = False

    def _obs(self, s: PendulumState) -> jnp.ndarray:
        return jnp.stack(
            [jnp.cos(s.theta), jnp.sin(s.theta), s.theta_dot / 1.0]
        ).astype(jnp.float32)

    def reset(self, rng: jax.Array) -> Tuple[PendulumState, jnp.ndarray]:
        r1, r2 = jax.random.split(rng)
        theta = jax.random.uniform(r1, (), jnp.float32, -jnp.pi, jnp.pi)
        theta_dot = jax.random.uniform(r2, (), jnp.float32, -1.0, 1.0)
        s = PendulumState(theta, theta_dot, jnp.zeros((), jnp.int32))
        return s, self._obs(s)

    def legal_mask(self, state: PendulumState) -> jnp.ndarray:
        return jnp.ones((max(self.action_space_size, 1),), bool)

    def _torque(self, action: jnp.ndarray) -> jnp.ndarray:
        if self.discrete_bins:
            # uniform bins over [-max_torque, max_torque] (reference
            # action_discretization_env_wrapper.py)
            return -self.max_torque + 2 * self.max_torque * action.astype(
                jnp.float32
            ) / (self.discrete_bins - 1)
        # continuous input is normalized to [-1, 1] (tanh policy output) and
        # scaled to the torque range (the reference's action-space scaling)
        a = jnp.asarray(action, jnp.float32).reshape(())
        return jnp.clip(a, -1.0, 1.0) * self.max_torque

    def step(self, s: PendulumState, action: jnp.ndarray, rng: jax.Array) -> EnvStep:
        u = self._torque(action)
        th, thdot = s.theta, s.theta_dot
        cost = _angle_normalize(th) ** 2 + 0.1 * thdot**2 + 0.001 * (u**2)
        newthdot = thdot + (
            3 * self.gravity / (2 * L) * jnp.sin(th) + 3.0 / (M * L**2) * u
        ) * DT
        newthdot = jnp.clip(newthdot, -MAX_SPEED, MAX_SPEED)
        newth = th + newthdot * DT
        t = s.t + 1
        done = t >= self.max_episode_steps
        ns = PendulumState(newth, newthdot, t)
        reset_s, reset_obs = self.reset(rng)
        out = jax.tree_util.tree_map(lambda a, b: jnp.where(done, a, b), reset_s, ns)
        return EnvStep(
            state=out,
            obs=self._obs(out),
            reward=(-cost).astype(jnp.float32),
            done=done,
            legal_mask=self.legal_mask(out),
            to_play=jnp.full((), -1, jnp.int32),
            truncated=done,  # pendulum only ends by time limit
        )
