"""CartPole-v0 as a pure JAX env (classic Barto-Sutton-Anderson dynamics,
matching gym's CartPoleEnv physics constants; reference wraps gym via
zoo/classic_control/cartpole/envs/cartpole_lightzero_env.py)."""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from lightzero_tpu.envs.base import EnvStep, JaxEnv
from lightzero_tpu.utils import ENV_REGISTRY

GRAVITY = 9.8
MASSCART = 1.0
MASSPOLE = 0.1
TOTAL_MASS = MASSCART + MASSPOLE
LENGTH = 0.5  # half pole length
POLEMASS_LENGTH = MASSPOLE * LENGTH
FORCE_MAG = 10.0
TAU = 0.02
THETA_THRESHOLD = 12 * 2 * jnp.pi / 360
X_THRESHOLD = 2.4


class CartPoleState(NamedTuple):
    x: jnp.ndarray
    x_dot: jnp.ndarray
    theta: jnp.ndarray
    theta_dot: jnp.ndarray
    t: jnp.ndarray  # step counter (int32)


@ENV_REGISTRY.register("cartpole")
class CartPoleEnv(JaxEnv):
    observation_shape = 4
    action_space_size = 2
    num_players = 1

    def __init__(self, max_episode_steps: int = 200):
        self.max_episode_steps = max_episode_steps

    def _obs(self, s: CartPoleState) -> jnp.ndarray:
        return jnp.stack([s.x, s.x_dot, s.theta, s.theta_dot]).astype(jnp.float32)

    def reset(self, rng: jax.Array) -> Tuple[CartPoleState, jnp.ndarray]:
        vals = jax.random.uniform(rng, (4,), jnp.float32, -0.05, 0.05)
        s = CartPoleState(vals[0], vals[1], vals[2], vals[3], jnp.zeros((), jnp.int32))
        return s, self._obs(s)

    def legal_mask(self, state: CartPoleState) -> jnp.ndarray:
        return jnp.ones((self.action_space_size,), bool)

    def step(self, state: CartPoleState, action: jnp.ndarray, rng: jax.Array) -> EnvStep:
        force = jnp.where(action == 1, FORCE_MAG, -FORCE_MAG)
        costheta = jnp.cos(state.theta)
        sintheta = jnp.sin(state.theta)
        temp = (force + POLEMASS_LENGTH * state.theta_dot**2 * sintheta) / TOTAL_MASS
        thetaacc = (GRAVITY * sintheta - costheta * temp) / (
            LENGTH * (4.0 / 3.0 - MASSPOLE * costheta**2 / TOTAL_MASS)
        )
        xacc = temp - POLEMASS_LENGTH * thetaacc * costheta / TOTAL_MASS
        x = state.x + TAU * state.x_dot
        x_dot = state.x_dot + TAU * xacc
        theta = state.theta + TAU * state.theta_dot
        theta_dot = state.theta_dot + TAU * thetaacc
        t = state.t + 1
        new_state = CartPoleState(x, x_dot, theta, theta_dot, t)

        failed = (jnp.abs(x) > X_THRESHOLD) | (jnp.abs(theta) > THETA_THRESHOLD)
        truncated = ~failed & (t >= self.max_episode_steps)
        done = failed | truncated
        reward = jnp.ones((), jnp.float32)

        reset_state, reset_obs = self.reset(rng)
        out_state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(done, a, b), reset_state, new_state
        )
        obs = jnp.where(done, reset_obs, self._obs(new_state))
        return EnvStep(
            state=out_state,
            obs=obs,
            reward=reward,
            done=done,
            legal_mask=jnp.ones((self.action_space_size,), bool),
            to_play=jnp.full((), -1, jnp.int32),
            truncated=truncated,
        )
