"""TicTacToe env tests (mirrors reference
zoo/board_games/tictactoe/envs/test_tictactoe_env.py + the Cython
get_done_winner kernel tests)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightzero_tpu.envs.board.tictactoe import TicTacToeEnv, TTTState, _would_win

pytestmark = pytest.mark.unittest


def make_state(board, to_play=1):
    return TTTState(
        board=jnp.asarray(board, jnp.int8),
        to_play=jnp.asarray(to_play, jnp.int32),
        done=jnp.asarray(False),
        winner=jnp.asarray(0, jnp.int32),
        t=jnp.asarray(int((np.asarray(board) != 0).sum()), jnp.int32),
    )


def test_win_detection_rows_cols_diags():
    env = TicTacToeEnv()
    # row win for player 1 after placing at 2
    s = make_state([1, 1, 0, 2, 2, 0, 0, 0, 0], to_play=1)
    ns = env.step_single(s, jnp.asarray(2))
    assert bool(ns.done) and int(ns.winner) == 1
    # col win for player 2
    s = make_state([2, 1, 1, 2, 1, 0, 0, 0, 0], to_play=2)
    ns = env.step_single(s, jnp.asarray(6))
    assert bool(ns.done) and int(ns.winner) == 2
    # diag win
    s = make_state([1, 2, 0, 2, 1, 0, 0, 0, 0], to_play=1)
    ns = env.step_single(s, jnp.asarray(8))
    assert bool(ns.done) and int(ns.winner) == 1


def test_draw():
    env = TicTacToeEnv()
    # X O X / X O O / O X -> play X at 8: full board, no winner
    s = make_state([1, 2, 1, 1, 2, 2, 2, 1, 0], to_play=1)
    ns = env.step_single(s, jnp.asarray(8))
    assert bool(ns.done) and int(ns.winner) == 0


def test_would_win_and_bot_blocks():
    env = TicTacToeEnv()
    s = make_state([1, 1, 0, 2, 0, 0, 0, 0, 0], to_play=2)
    ww = np.asarray(_would_win(s.board, jnp.asarray(1, jnp.int32)))
    assert ww[2] and ww.sum() == 1
    # bot (player 2) must block at 2
    a = int(env.bot_action(s, jax.random.PRNGKey(0)))
    assert a == 2
    # bot takes its own win over blocking
    s2 = make_state([1, 1, 0, 2, 2, 0, 0, 0, 0], to_play=2)
    a2 = int(env.bot_action(s2, jax.random.PRNGKey(0)))
    assert a2 == 5


def test_selfplay_step_reward_and_reset():
    env = TicTacToeEnv(battle_mode="self_play_mode")
    s = make_state([1, 1, 0, 2, 2, 0, 0, 0, 0], to_play=1)
    step = env.step(s, jnp.asarray(2), jax.random.PRNGKey(0))
    assert bool(step.done) and float(step.reward) == 1.0
    # auto-reset: fresh board
    assert int(np.asarray(step.state.board).sum()) == 0


def test_observation_perspective():
    env = TicTacToeEnv()
    s = make_state([1, 2, 0, 0, 0, 0, 0, 0, 0], to_play=2)
    obs = np.asarray(env.observation(s))
    assert obs.shape == (3, 3, 3)
    assert obs[0, 0, 0] == 0 and obs[0, 1, 0] == 1  # own plane = player2 stones
    assert obs[0, 0, 1] == 1  # opponent plane = player1 stones
    assert obs[0, 0, 2] == 0  # color plane: player2 to move


def test_bot_vs_bot_never_loses_to_random():
    """Rule bot should rarely lose vs a random player (sanity, mirrors the
    reference bot win-rate tests)."""
    env = TicTacToeEnv()
    rng = jax.random.PRNGKey(3)
    results = []
    step_single = jax.jit(env.step_single)
    bot_action = jax.jit(env.bot_action)
    for g in range(10):
        s = env.init_state()
        rng, g_rng = jax.random.split(rng)
        while not bool(s.done):
            rng, a_rng = jax.random.split(rng)
            if int(s.to_play) == 1:  # random player
                legal = np.asarray(env.legal_mask(s))
                choices = np.nonzero(legal)[0]
                a = int(jax.random.choice(a_rng, jnp.asarray(choices)))
            else:  # rule bot
                a = int(bot_action(s, a_rng))
            s = step_single(s, jnp.asarray(a))
        results.append(int(s.winner))
    # bot (player 2) should lose at most rarely
    assert sum(1 for w in results if w == 1) <= 3
