"""2048 as a pure JAX env (stochastic tile spawns with chance codes).

Capability-parity rebuild of reference zoo/game_2048/envs/game_2048_env.py:
slide+merge dynamics, reward = sum of merged tile values, tile spawn 2
(p=0.9) / 4 (p=0.1) at a uniform empty cell, termination when no move
changes the board. The spawn's chance code = cell*2 + (tile==4), giving a
chance space of 32 (16 cells × 2 values) for Stochastic MuZero's
true-chance-label training (use_ture_chance_label_in_chance_encoder,
lzero/policy/muzero.py:195-196).

Observation: (4, 4, 16) one-hot exponent planes.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from lightzero_tpu.envs.base import EnvStep, JaxEnv
from lightzero_tpu.utils import ENV_REGISTRY

NUM_EXPONENTS = 16  # tiles up to 2^15 = 32768


class G2048State(NamedTuple):
    board: jnp.ndarray  # (4, 4) int32 exponents, 0 = empty
    score: jnp.ndarray  # f32 cumulative
    t: jnp.ndarray  # int32


def _slide_row_left(row: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compress + merge one row of 4 exponents. Returns (new_row, reward)."""
    # stable-compact nonzeros to the left
    order = jnp.argsort(row == 0, stable=True)
    r = row[order]

    def cell(carry, v):
        out, pos, last, reward = carry
        merge = (v != 0) & (last == v)
        write_merged = merge
        # merge: overwrite pending slot with v+1
        out = jnp.where(
            write_merged, out.at[pos - 1].set(v + 1), out
        )
        reward = reward + jnp.where(merge, jnp.exp2(v + 1.0), 0.0)
        # non-merge nonempty: write v at pos
        write_new = (v != 0) & ~merge
        out = jnp.where(write_new, out.at[pos].set(v), out)
        pos = pos + jnp.where(write_new, 1, 0)
        last = jnp.where(merge, 0, jnp.where(v != 0, v, last))
        return (out, pos, last, reward), None

    init = (jnp.zeros(4, row.dtype), jnp.asarray(0, jnp.int32), jnp.asarray(0, row.dtype), jnp.asarray(0.0, jnp.float32))
    (out, _, _, reward), _ = jax.lax.scan(cell, init, r)
    return out, reward


def _slide_board(board: jnp.ndarray, direction: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """direction: 0=up 1=right 2=down 3=left (gym-2048 convention)."""

    def apply(b):
        rows, rewards = jax.vmap(_slide_row_left)(b)
        return rows, rewards.sum()

    def up(b):
        r, rew = apply(b.T)
        return r.T, rew

    def right(b):
        r, rew = apply(b[:, ::-1])
        return r[:, ::-1], rew

    def down(b):
        r, rew = apply(b.T[:, ::-1])
        return r[:, ::-1].T, rew

    def left(b):
        return apply(b)

    return jax.lax.switch(direction, [up, right, down, left], board)


@ENV_REGISTRY.register("game_2048")
class Game2048Env(JaxEnv):
    observation_shape = (4, 4, NUM_EXPONENTS)
    action_space_size = 4
    num_players = 1
    chance_space_size = 32

    def __init__(self, max_episode_steps: int = 2000):
        self.max_episode_steps = max_episode_steps

    def observation(self, s: G2048State) -> jnp.ndarray:
        return jax.nn.one_hot(s.board, NUM_EXPONENTS, dtype=jnp.float32)

    def _legal(self, board: jnp.ndarray) -> jnp.ndarray:
        def changed(d):
            nb, _ = _slide_board(board, d)
            return jnp.any(nb != board)

        return jax.vmap(changed)(jnp.arange(4))

    def legal_mask(self, s: G2048State) -> jnp.ndarray:
        return self._legal(s.board)

    def _spawn(self, board: jnp.ndarray, rng: jax.Array):
        """Add a 2 (p=.9) or 4 (p=.1) tile at a uniform empty cell; returns
        (board, chance_code)."""
        cell_rng, val_rng = jax.random.split(rng)
        flat = board.reshape(-1)
        empty = flat == 0
        logits = jnp.where(empty, 0.0, -jnp.inf)
        cell = jax.random.categorical(cell_rng, logits)
        is_four = jax.random.uniform(val_rng) < 0.1
        val = jnp.where(is_four, 2, 1).astype(board.dtype)
        flat = flat.at[cell].set(jnp.where(empty[cell], val, flat[cell]))
        chance = (cell * 2 + is_four.astype(jnp.int32)).astype(jnp.int32)
        return flat.reshape(4, 4), chance

    def reset(self, rng: jax.Array) -> Tuple[G2048State, jnp.ndarray]:
        r1, r2 = jax.random.split(rng)
        board = jnp.zeros((4, 4), jnp.int32)
        board, _ = self._spawn(board, r1)
        board, _ = self._spawn(board, r2)
        s = G2048State(board=board, score=jnp.zeros((), jnp.float32), t=jnp.zeros((), jnp.int32))
        return s, self.observation(s)

    def step(self, s: G2048State, action: jnp.ndarray, rng: jax.Array) -> EnvStep:
        slid, reward = _slide_board(s.board, action)
        moved = jnp.any(slid != s.board)
        spawn_rng, reset_rng = jax.random.split(rng)
        spawned, chance = self._spawn(slid, spawn_rng)
        board = jnp.where(moved, spawned, s.board)
        reward = jnp.where(moved, reward, 0.0)
        chance = jnp.where(moved, chance, 0)
        t = s.t + 1
        no_moves = ~jnp.any(self._legal(board))
        truncated = ~no_moves & (t >= self.max_episode_steps)
        done = no_moves | truncated
        ns = G2048State(board=board, score=s.score + reward, t=t)

        reset_state, reset_obs = self.reset(reset_rng)
        out = jax.tree_util.tree_map(lambda a, b: jnp.where(done, a, b), reset_state, ns)
        return EnvStep(
            state=out,
            obs=self.observation(out),
            reward=reward.astype(jnp.float32),
            done=done,
            truncated=truncated,
            legal_mask=self._legal(out.board),
            to_play=jnp.full((), -1, jnp.int32),
            chance=chance,
        )
