"""Go env rules: captures, suicide, simple ko, scoring, bot games
(reference zoo/board_games/go/envs/go_env.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightzero_tpu.envs.board.go import GoEnv, GoState

pytestmark = [pytest.mark.unittest, pytest.mark.envtest]


def _state(env, board, to_play=1, ko=-1):
    return GoState(
        board=jnp.asarray(board, jnp.int8).reshape(-1),
        to_play=jnp.asarray(to_play, jnp.int32),
        done=jnp.zeros((), bool),
        winner=jnp.zeros((), jnp.int32),
        t=jnp.asarray(4, jnp.int32),
        passes=jnp.zeros((), jnp.int32),
        ko_point=jnp.asarray(ko, jnp.int32),
    )


def test_capture_single_stone():
    env = GoEnv(board_size=5)
    # white stone at (1,1) surrounded on 3 sides by black; black plays the
    # 4th liberty (1,2) and captures
    b = np.zeros((5, 5), np.int8)
    b[1, 1] = 2
    b[0, 1] = 1
    b[2, 1] = 1
    b[1, 0] = 1
    s = _state(env, b, to_play=1)
    ns = jax.jit(env.step_single)(s, jnp.asarray(1 * 5 + 2))
    board = np.asarray(ns.board).reshape(5, 5)
    assert board[1, 1] == 0  # captured
    assert board[1, 2] == 1


def test_suicide_is_illegal():
    env = GoEnv(board_size=5)
    # empty point (1,1) fully surrounded by black: suicide for white
    b = np.zeros((5, 5), np.int8)
    for r, c in [(0, 1), (2, 1), (1, 0), (1, 2)]:
        b[r, c] = 1
    s = _state(env, b, to_play=2)
    legal = np.asarray(jax.jit(env.legal_mask_board)(s)).reshape(5, 5)
    assert not legal[1, 1]
    # but legal for black (connects to own alive groups)
    s1 = _state(env, b, to_play=1)
    legal1 = np.asarray(jax.jit(env.legal_mask_board)(s1)).reshape(5, 5)
    assert legal1[1, 1]


def test_capture_is_legal_even_without_liberty():
    env = GoEnv(board_size=5)
    # white at (1,1) in atari with last liberty (1,2); playing (1,2) for
    # black would itself have no liberty EXCEPT that it captures
    b = np.zeros((5, 5), np.int8)
    b[1, 1] = 2
    b[0, 1] = 1
    b[2, 1] = 1
    b[1, 0] = 1
    # surround (1,2) so the capture is the only source of liberties
    b[0, 2] = 2
    b[2, 2] = 2
    b[1, 3] = 2
    s = _state(env, b, to_play=1)
    legal = np.asarray(jax.jit(env.legal_mask_board)(s)).reshape(5, 5)
    assert legal[1, 2]


def test_simple_ko_forbidden():
    env = GoEnv(board_size=5)
    # classic ko shape: black captures at the ko point; white may not
    # immediately recapture
    b = np.zeros((5, 5), np.int8)
    # black stones
    for r, c in [(1, 1), (0, 2), (2, 2)]:
        b[r, c] = 1
    # white stones
    for r, c in [(0, 3), (2, 3), (1, 4), (1, 2)]:
        b[r, c] = 2
    s = _state(env, b, to_play=1)
    ns = jax.jit(env.step_single)(s, jnp.asarray(1 * 5 + 3))  # black captures (1,2)
    board = np.asarray(ns.board).reshape(5, 5)
    assert board[1, 2] == 0 and board[1, 3] == 1
    assert int(ns.ko_point) == 1 * 5 + 2
    legal_w = np.asarray(env.legal_mask_board(ns)).reshape(5, 5)
    assert not legal_w[1, 2]  # ko recapture forbidden


def test_two_passes_end_and_score():
    env = GoEnv(board_size=5, komi=0.5)
    # black clearly ahead: black wall owning the left side
    b = np.zeros((5, 5), np.int8)
    b[:, 2] = 1
    b[0, 4] = 2
    s = _state(env, b, to_play=1)
    N = 25
    ns = env.step_single(s, jnp.asarray(N))  # black pass
    ns = env.step_single(ns, jnp.asarray(N))  # white pass -> game over
    assert bool(ns.done)
    assert int(ns.winner) == 1


def test_bot_game_terminates_and_registry():
    from lightzero_tpu.utils import ENV_REGISTRY

    assert ENV_REGISTRY.get("go") is GoEnv
    env = GoEnv(board_size=5, battle_mode="play_with_bot_mode", max_moves=60)
    rng = jax.random.PRNGKey(0)
    s, obs = env.reset(rng)
    assert obs.shape == (5, 5, 3)
    step = jax.jit(env.step)
    done_seen = False
    for i in range(70):
        rng, a_rng, s_rng = jax.random.split(rng, 3)
        legal = env.legal_mask(s)
        a = jax.random.categorical(a_rng, jnp.where(legal, 0.0, -jnp.inf))
        out = step(s, a, s_rng)
        s = out.state
        if bool(out.done):
            done_seen = True
            break
    assert done_seen


def test_selfplay_winner_reward():
    env = GoEnv(board_size=5, komi=0.5, battle_mode="self_play_mode")
    b = np.zeros((5, 5), np.int8)
    b[:, 2] = 1  # black dominating
    s = _state(env, b, to_play=1)
    rng = jax.random.PRNGKey(1)
    out = env.step(s, jnp.asarray(25), rng)  # black passes
    out = env.step(out.state, jnp.asarray(25), rng)  # white passes -> over
    # the mover of the final step is white, who LOSES: reward -1
    assert float(out.reward) == -1.0
