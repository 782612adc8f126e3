"""bsuite-class probe envs as pure JAX (role of reference
zoo/bsuite/envs/bsuite_lightzero_env.py, which wraps deepmind/bsuite —
absent from this image; these are from-scratch implementations of the two
probes the reference's bsuite configs actually exercise).

- ``deep_sea`` (size N): the canonical hard-exploration probe. The agent
  descends an N x N grid; action 1 ("right") costs 0.01/N and only the
  all-right trajectory reaches the +1 treasure at the bottom-right. A
  uniform policy finds it with probability 2^-N, so sustained directed
  exploration (root Dirichlet noise + value bootstrapping) is required.
  Obs: one-hot (N, N) board of the agent position, flattened.
- ``catch`` (rows x cols): move a paddle on the bottom row to catch a
  falling ball; +1 on catch, -1 on miss. The classic credit-assignment
  probe. Obs: (rows * cols) two-plane-free binary board (ball + paddle).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from lightzero_tpu.envs.base import EnvStep, JaxEnv
from lightzero_tpu.utils import ENV_REGISTRY


class DeepSeaState(NamedTuple):
    row: jnp.ndarray
    col: jnp.ndarray
    # fixed per-episode action-flip mask row (bsuite randomizes which raw
    # action means "right" per column; deterministic variant keeps it off)
    t: jnp.ndarray


@ENV_REGISTRY.register("deep_sea")
class DeepSeaEnv(JaxEnv):
    num_players = 1

    def __init__(self, size: int = 10, randomize_actions: bool = False):
        self.size = int(size)
        self.observation_shape = self.size * self.size
        self.action_space_size = 2
        self.move_cost = 0.01 / self.size

    def _obs(self, s: DeepSeaState) -> jnp.ndarray:
        board = jnp.zeros((self.size, self.size), jnp.float32)
        inside = s.row < self.size
        board = board.at[jnp.minimum(s.row, self.size - 1), s.col].set(
            jnp.where(inside, 1.0, 0.0)
        )
        return board.reshape(-1)

    def reset(self, rng: jax.Array) -> Tuple[DeepSeaState, jnp.ndarray]:
        z = jnp.zeros((), jnp.int32)
        s = DeepSeaState(row=z, col=z, t=z)
        return s, self._obs(s)

    def legal_mask(self, state: DeepSeaState) -> jnp.ndarray:
        return jnp.ones((2,), bool)

    def step(self, state: DeepSeaState, action: jnp.ndarray, rng: jax.Array) -> EnvStep:
        go_right = action == 1
        col = jnp.where(go_right, jnp.minimum(state.col + 1, self.size - 1),
                        jnp.maximum(state.col - 1, 0))
        row = state.row + 1
        t = state.t + 1
        done = row >= self.size
        treasure = done & (state.col == self.size - 1) & go_right
        reward = (jnp.where(treasure, 1.0, 0.0)
                  - jnp.where(go_right, self.move_cost, 0.0)).astype(jnp.float32)
        ns = DeepSeaState(row=row, col=col, t=t)
        reset_s, reset_obs = self.reset(rng)
        out = jax.tree_util.tree_map(lambda a, b: jnp.where(done, a, b), reset_s, ns)
        return EnvStep(
            state=out,
            obs=jnp.where(done, reset_obs, self._obs(ns)),
            reward=reward,
            done=done,
            legal_mask=jnp.ones((2,), bool),
            to_play=jnp.full((), -1, jnp.int32),
        )


class CatchState(NamedTuple):
    ball_row: jnp.ndarray
    ball_col: jnp.ndarray
    paddle: jnp.ndarray
    t: jnp.ndarray


@ENV_REGISTRY.register("catch")
class CatchEnv(JaxEnv):
    num_players = 1

    def __init__(self, rows: int = 10, cols: int = 5):
        self.rows, self.cols = int(rows), int(cols)
        self.observation_shape = self.rows * self.cols
        self.action_space_size = 3  # left, stay, right

    def _obs(self, s: CatchState) -> jnp.ndarray:
        board = jnp.zeros((self.rows, self.cols), jnp.float32)
        board = board.at[jnp.minimum(s.ball_row, self.rows - 1), s.ball_col].set(1.0)
        board = board.at[self.rows - 1, s.paddle].set(
            board[self.rows - 1, s.paddle] + 1.0
        )
        return board.reshape(-1)

    def reset(self, rng: jax.Array) -> Tuple[CatchState, jnp.ndarray]:
        col = jax.random.randint(rng, (), 0, self.cols)
        s = CatchState(
            ball_row=jnp.zeros((), jnp.int32), ball_col=col.astype(jnp.int32),
            paddle=jnp.asarray(self.cols // 2, jnp.int32), t=jnp.zeros((), jnp.int32),
        )
        return s, self._obs(s)

    def legal_mask(self, state: CatchState) -> jnp.ndarray:
        return jnp.ones((3,), bool)

    def step(self, state: CatchState, action: jnp.ndarray, rng: jax.Array) -> EnvStep:
        paddle = jnp.clip(state.paddle + (action - 1), 0, self.cols - 1).astype(jnp.int32)
        ball_row = state.ball_row + 1
        done = ball_row >= self.rows - 1
        reward = jnp.where(
            done, jnp.where(state.ball_col == paddle, 1.0, -1.0), 0.0
        ).astype(jnp.float32)
        ns = CatchState(ball_row=ball_row, ball_col=state.ball_col, paddle=paddle,
                        t=state.t + 1)
        reset_s, reset_obs = self.reset(rng)
        out = jax.tree_util.tree_map(lambda a, b: jnp.where(done, a, b), reset_s, ns)
        return EnvStep(
            state=out,
            obs=jnp.where(done, reset_obs, self._obs(ns)),
            reward=reward,
            done=done,
            legal_mask=jnp.ones((3,), bool),
            to_play=jnp.full((), -1, jnp.int32),
        )
