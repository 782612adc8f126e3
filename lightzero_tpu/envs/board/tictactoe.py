"""TicTacToe as a pure JAX two-player board env.

Capability-parity rebuild of reference
zoo/board_games/tictactoe/envs/tictactoe_env.py: battle modes
(self_play_mode / play_with_bot_mode / eval_mode, :83-87), rule-based bot
(win-then-block heuristic, the role of rule_bot_v0), 3-plane observation
from the current player's perspective, and `simulate_action` cloning — which
here is simply `step_single` on an immutable state pytree (the pure-
functional env IS its own simulator, so AlphaZero search needs no cloning).

Win detection is a vectorized line-sum check (replaces the Cython
get_done_winner kernel, zoo/board_games/tictactoe/envs/
get_done_winner_cython.pyx) — one gather + reduction, fully jittable.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lightzero_tpu.envs.base import EnvStep, JaxEnv
from lightzero_tpu.utils import ENV_REGISTRY

# 8 winning lines as flat indices into the 3x3 board
LINES = np.array(
    [
        [0, 1, 2], [3, 4, 5], [6, 7, 8],  # rows
        [0, 3, 6], [1, 4, 7], [2, 5, 8],  # cols
        [0, 4, 8], [2, 4, 6],  # diagonals
    ],
    np.int32,
)


class TTTState(NamedTuple):
    board: jnp.ndarray  # (9,) int8: 0 empty, 1, 2
    to_play: jnp.ndarray  # int32 1|2
    done: jnp.ndarray  # bool
    winner: jnp.ndarray  # int32 0 draw/none, 1, 2
    t: jnp.ndarray  # int32 move count


def _wins(board: jnp.ndarray, player: jnp.ndarray) -> jnp.ndarray:
    lines = board[jnp.asarray(LINES)]  # (8, 3)
    return jnp.any(jnp.all(lines == player.astype(board.dtype), axis=1))


def _would_win(board: jnp.ndarray, player: jnp.ndarray) -> jnp.ndarray:
    """(9,) bool: placing `player` at each empty cell wins immediately."""
    lines = board[jnp.asarray(LINES)]  # (8,3)
    p = player.astype(board.dtype)
    own = (lines == p).sum(axis=1)
    empty = (lines == 0).sum(axis=1)
    critical = (own == 2) & (empty == 1)  # (8,) line one-away from win
    cell_in_critical = jnp.zeros((9,), bool)
    for li in range(8):
        for ci in range(3):
            idx = int(LINES[li, ci])
            cell_in_critical = cell_in_critical.at[idx].set(
                cell_in_critical[idx] | (critical[li] & (board[idx] == 0))
            )
    return cell_in_critical


@ENV_REGISTRY.register("tictactoe")
class TicTacToeEnv(JaxEnv):
    observation_shape = (3, 3, 3)
    action_space_size = 9
    num_players = 2

    def __init__(self, battle_mode: str = "self_play_mode", bot_action_type: str = "rule"):
        assert battle_mode in ("self_play_mode", "play_with_bot_mode", "eval_mode")
        self.battle_mode = battle_mode
        self.bot_action_type = bot_action_type

    # ----------------------------------------------------------- primitives
    def observation(self, s: TTTState) -> jnp.ndarray:
        """3 planes from the current player's perspective
        (tictactoe_env.py current_state: own / opponent / to_play plane)."""
        own = (s.board == s.to_play.astype(s.board.dtype)).astype(jnp.float32)
        opp_player = jnp.where(s.to_play == 1, 2, 1).astype(s.board.dtype)
        opp = (s.board == opp_player).astype(jnp.float32)
        color = jnp.full((9,), (s.to_play == 1).astype(jnp.float32))
        return jnp.stack([own.reshape(3, 3), opp.reshape(3, 3), color.reshape(3, 3)], axis=-1)

    def legal_mask(self, s: TTTState) -> jnp.ndarray:
        return (s.board == 0) & ~s.done

    def init_state(self) -> TTTState:
        return TTTState(
            board=jnp.zeros((9,), jnp.int8),
            to_play=jnp.ones((), jnp.int32),
            done=jnp.zeros((), bool),
            winner=jnp.zeros((), jnp.int32),
            t=jnp.zeros((), jnp.int32),
        )

    def reset(self, rng: jax.Array) -> Tuple[TTTState, jnp.ndarray]:
        s = self.init_state()
        return s, self.observation(s)

    def step_single(self, s: TTTState, action: jnp.ndarray) -> TTTState:
        """One stone placed by to_play; no auto-reset (search/simulator
        path — the reference's simulate_action, tictactoe_env.py:577)."""
        board = s.board.at[action].set(s.to_play.astype(s.board.dtype))
        won = _wins(board, s.to_play)
        full = jnp.all(board != 0)
        done = won | full | s.done
        winner = jnp.where(won, s.to_play, 0).astype(jnp.int32)
        winner = jnp.where(s.done, s.winner, winner)
        return TTTState(
            board=board,
            to_play=jnp.where(s.to_play == 1, 2, 1).astype(jnp.int32),
            done=done,
            winner=winner,
            t=s.t + 1,
        )

    def bot_action(self, s: TTTState, rng: jax.Array) -> jnp.ndarray:
        """Win if possible, else block, else random legal (rule_bot role)."""
        legal = self.legal_mask(s)
        me = s.to_play
        opp = jnp.where(me == 1, 2, 1).astype(jnp.int32)
        win_moves = _would_win(s.board, me) & legal
        block_moves = _would_win(s.board, opp) & legal
        noise = jax.random.uniform(rng, (9,))
        score = (
            win_moves.astype(jnp.float32) * 100.0
            + block_moves.astype(jnp.float32) * 10.0
            + legal.astype(jnp.float32)
            + noise * 0.5
        )
        return jnp.argmax(jnp.where(legal, score, -jnp.inf)).astype(jnp.int32)

    # -------------------------------------------------------- collector API
    def step(self, s: TTTState, action: jnp.ndarray, rng: jax.Array) -> EnvStep:
        if self.battle_mode == "self_play_mode":
            mover = s.to_play
            ns = self.step_single(s, action)
            # reward +1 to the mover on win (collector backfills per-player z)
            reward = jnp.where(ns.done & (ns.winner == mover), 1.0, 0.0)
        else:
            # play_with_bot_mode / eval_mode: agent is player 1; env replies
            # with the bot move (tictactoe_env.py:213-254)
            agent = s.to_play
            ns = self.step_single(s, action)
            bot_rng, rng = jax.random.split(rng)
            bot_a = self.bot_action(ns, bot_rng)
            after_bot = self.step_single(ns, bot_a)
            ns = jax.tree_util.tree_map(
                lambda a, b: jnp.where(ns.done, a, b), ns, after_bot
            )
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
