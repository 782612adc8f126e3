"""Gomoku (five-in-a-row) as a pure JAX two-player board env (reference
zoo/board_games/gomoku/envs/gomoku_env.py; board_size configurable — the
reference benchmarks 15×15 and a 6×6 mini variant)."""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from lightzero_tpu.envs.base import EnvStep, JaxEnv
from lightzero_tpu.envs.board.board_utils import make_lines, would_win, wins
from lightzero_tpu.utils import ENV_REGISTRY


class GomokuState(NamedTuple):
    board: jnp.ndarray  # (S*S,) int8
    to_play: jnp.ndarray
    done: jnp.ndarray
    winner: jnp.ndarray
    t: jnp.ndarray


@ENV_REGISTRY.register("gomoku")
class GomokuEnv(JaxEnv):
    num_players = 2

    def __init__(self, board_size: int = 6, n_in_row: int = 4, battle_mode: str = "self_play_mode"):
        # reference mini-gomoku default: 6×6 board, 4-in-a-row
        assert battle_mode in ("self_play_mode", "play_with_bot_mode", "eval_mode")
        self.battle_mode = battle_mode
        self.S = board_size
        self.n = n_in_row
        self.observation_shape = (board_size, board_size, 3)
        self.action_space_size = board_size * board_size
        self._lines = jnp.asarray(make_lines(board_size, board_size, n_in_row))

    def observation(self, s: GomokuState) -> jnp.ndarray:
        S = self.S
        own = (s.board == s.to_play.astype(s.board.dtype)).astype(jnp.float32)
        opp_p = jnp.where(s.to_play == 1, 2, 1).astype(s.board.dtype)
        opp = (s.board == opp_p).astype(jnp.float32)
        color = jnp.full((S * S,), (s.to_play == 1).astype(jnp.float32))
        return jnp.stack([own.reshape(S, S), opp.reshape(S, S), color.reshape(S, S)], axis=-1)

    def legal_mask(self, s: GomokuState) -> jnp.ndarray:
        return (s.board == 0) & ~s.done

    def init_state(self) -> GomokuState:
        return GomokuState(
            board=jnp.zeros((self.S * self.S,), jnp.int8),
            to_play=jnp.ones((), jnp.int32),
            done=jnp.zeros((), bool),
            winner=jnp.zeros((), jnp.int32),
            t=jnp.zeros((), jnp.int32),
        )

    def reset(self, rng: jax.Array) -> Tuple[GomokuState, jnp.ndarray]:
        s = self.init_state()
        return s, self.observation(s)

    def step_single(self, s: GomokuState, action: jnp.ndarray) -> GomokuState:
        board = s.board.at[action].set(s.to_play.astype(s.board.dtype))
        won = wins(board, self._lines, s.to_play)
        full = jnp.all(board != 0)
        done = won | full | s.done
        winner = jnp.where(s.done, s.winner, jnp.where(won, s.to_play, 0).astype(jnp.int32))
        return GomokuState(
            board=board,
            to_play=jnp.where(s.to_play == 1, 2, 1).astype(jnp.int32),
            done=done,
            winner=winner,
            t=s.t + 1,
        )

    def bot_action(self, s: GomokuState, rng: jax.Array) -> jnp.ndarray:
        """Win-in-1 > block > adjacency heuristic (the role of the
        reference's gomoku rule_bot_v0)."""
        S = self.S
        legal = self.legal_mask(s)
        me = s.to_play
        opp = jnp.where(me == 1, 2, 1).astype(jnp.int32)
        win_cells = would_win(s.board, self._lines, me)
        block_cells = would_win(s.board, self._lines, opp)
        # adjacency: prefer cells next to existing stones
        grid = (s.board != 0).astype(jnp.float32).reshape(S, S)
        padded = jnp.pad(grid, 1)
        neigh = sum(
            padded[1 + dr : 1 + dr + S, 1 + dc : 1 + dc + S]
            for dr in (-1, 0, 1)
            for dc in (-1, 0, 1)
            if (dr, dc) != (0, 0)
        ).reshape(-1)
        noise = jax.random.uniform(rng, (S * S,))
        score = (
            win_cells.astype(jnp.float32) * 100.0
            + block_cells.astype(jnp.float32) * 10.0
            + jnp.minimum(neigh, 1.0)
            + noise * 0.5
        )
        return jnp.argmax(jnp.where(legal, score, -jnp.inf)).astype(jnp.int32)

    def step(self, s: GomokuState, action: jnp.ndarray, rng: jax.Array) -> EnvStep:
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
