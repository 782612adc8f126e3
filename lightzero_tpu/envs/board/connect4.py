"""Connect4 as a pure JAX two-player board env (reference
zoo/board_games/connect4/envs/connect4_env.py: 6×7 board, drop-in-column
actions, 4-in-a-row win, battle modes + rule bot)."""
from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from lightzero_tpu.envs.base import EnvStep, JaxEnv
from lightzero_tpu.envs.board.board_utils import make_lines, would_win, wins
from lightzero_tpu.utils import ENV_REGISTRY

H, W = 6, 7
LINES = make_lines(H, W, 4)  # (69, 4)


class C4State(NamedTuple):
    board: jnp.ndarray  # (42,) int8, row 0 = bottom
    to_play: jnp.ndarray
    done: jnp.ndarray
    winner: jnp.ndarray
    t: jnp.ndarray


@ENV_REGISTRY.register("connect4")
class Connect4Env(JaxEnv):
    observation_shape = (6, 7, 3)
    action_space_size = 7
    num_players = 2

    def __init__(self, battle_mode: str = "self_play_mode"):
        assert battle_mode in ("self_play_mode", "play_with_bot_mode", "eval_mode")
        self.battle_mode = battle_mode
        self._lines = jnp.asarray(LINES)

    def observation(self, s: C4State) -> jnp.ndarray:
        own = (s.board == s.to_play.astype(s.board.dtype)).astype(jnp.float32)
        opp_p = jnp.where(s.to_play == 1, 2, 1).astype(s.board.dtype)
        opp = (s.board == opp_p).astype(jnp.float32)
        color = jnp.full((H * W,), (s.to_play == 1).astype(jnp.float32))
        return jnp.stack([own.reshape(H, W), opp.reshape(H, W), color.reshape(H, W)], axis=-1)

    def legal_mask(self, s: C4State) -> jnp.ndarray:
        # a column is legal iff its top cell (row H-1) is empty
        top = s.board.reshape(H, W)[H - 1]
        return (top == 0) & ~s.done

    def init_state(self) -> C4State:
        return C4State(
            board=jnp.zeros((H * W,), jnp.int8),
            to_play=jnp.ones((), jnp.int32),
            done=jnp.zeros((), bool),
            winner=jnp.zeros((), jnp.int32),
            t=jnp.zeros((), jnp.int32),
        )

    def reset(self, rng: jax.Array) -> Tuple[C4State, jnp.ndarray]:
        s = self.init_state()
        return s, self.observation(s)

    def step_single(self, s: C4State, action: jnp.ndarray) -> C4State:
        col = action
        grid = s.board.reshape(H, W)
        heights = jnp.sum(grid != 0, axis=0)  # pieces per column
        row = jnp.clip(heights[col], 0, H - 1)
        idx = row * W + col
        board = s.board.at[idx].set(s.to_play.astype(s.board.dtype))
        won = wins(board, self._lines, s.to_play)
        full = jnp.all(board != 0)
        done = won | full | s.done
        winner = jnp.where(s.done, s.winner, jnp.where(won, s.to_play, 0).astype(jnp.int32))
        return C4State(
            board=board,
            to_play=jnp.where(s.to_play == 1, 2, 1).astype(jnp.int32),
            done=done,
            winner=winner,
            t=s.t + 1,
        )

    def bot_action(self, s: C4State, rng: jax.Array) -> jnp.ndarray:
        legal = self.legal_mask(s)
        me = s.to_play
        opp = jnp.where(me == 1, 2, 1).astype(jnp.int32)
        # map win-in-1 CELLS to columns: the cell must be the next drop slot
        grid = s.board.reshape(H, W)
        heights = jnp.sum(grid != 0, axis=0)
        drop_cells = jnp.clip(heights, 0, H - 1) * W + jnp.arange(W)  # (7,)
        win_cells = would_win(s.board, self._lines, me)
        block_cells = would_win(s.board, self._lines, opp)
        win_cols = win_cells[drop_cells]
        block_cols = block_cells[drop_cells]
        noise = jax.random.uniform(rng, (W,))
        # mild center preference, win > block > center
        center_pref = -jnp.abs(jnp.arange(W) - 3).astype(jnp.float32) * 0.1
        score = (
            win_cols.astype(jnp.float32) * 100.0
            + block_cols.astype(jnp.float32) * 10.0
            + center_pref
            + noise * 0.5
        )
        return jnp.argmax(jnp.where(legal, score, -jnp.inf)).astype(jnp.int32)

    def step(self, s: C4State, action: jnp.ndarray, rng: jax.Array) -> EnvStep:
        if self.battle_mode == "self_play_mode":
            mover = s.to_play
            ns = self.step_single(s, action)
            reward = jnp.where(ns.done & (ns.winner == mover), 1.0, 0.0)
        else:
            agent = s.to_play
            ns = self.step_single(s, action)
            bot_rng, rng = jax.random.split(rng)
            bot_a = self.bot_action(ns, bot_rng)
            after_bot = self.step_single(ns, bot_a)
            ns = jax.tree_util.tree_map(lambda a, b: jnp.where(ns.done, a, b), ns, after_bot)
            reward = jnp.where(
                ns.done & (ns.winner == agent),
                1.0,
                jnp.where(ns.done & (ns.winner != 0), -1.0, 0.0),
            )
        reset_s, _ = self.reset(rng)
        out_s = jax.tree_util.tree_map(lambda a, b: jnp.where(ns.done, a, b), reset_s, ns)
        return EnvStep(
            state=out_s,
            obs=self.observation(out_s),
            reward=reward.astype(jnp.float32),
            done=ns.done,
            legal_mask=self.legal_mask(out_s),
            # reference sets to_play=-1 outside self-play (1p MCTS backup
            # semantics; tictactoe_env.py:235-251)
            to_play=(
                out_s.to_play
                if self.battle_mode == "self_play_mode"
                else jnp.full((), -1, jnp.int32)
            ),
        )

    def initial_to_play(self, state):
        if self.battle_mode == "self_play_mode":
            return state.to_play.astype(jnp.int32)
        return jnp.full((), -1, jnp.int32)
