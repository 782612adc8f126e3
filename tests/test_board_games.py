"""Connect4 + Gomoku env tests (mirrors reference zoo/board_games tests)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.unittest


def test_connect4_gravity_and_win():
    from lightzero_tpu.envs.board.connect4 import Connect4Env

    env = Connect4Env()
    s = env.init_state()
    # p1 stacks col 0 (alternating with p2 in col 6): p1 wins vertically
    step = jax.jit(env.step_single)
    for i in range(3):
        s = step(s, jnp.asarray(0))  # p1
        s = step(s, jnp.asarray(6))  # p2
    assert not bool(s.done)
    s = step(s, jnp.asarray(0))  # p1 fourth in col 0
    assert bool(s.done) and int(s.winner) == 1
    # gravity: col 0 holds exactly 4 pieces in rows 0..3
    grid = np.asarray(s.board).reshape(6, 7)
    assert (grid[:4, 0] == 1).all() and grid[4, 0] == 0


def test_connect4_bot_blocks():
    from lightzero_tpu.envs.board.connect4 import Connect4Env

    env = Connect4Env()
    s = env.init_state()
    step = jax.jit(env.step_single)
    # p1 has 3 in a row at cols 0-2 bottom; p2 to move must block col 3
    for c, p in [(0, 1), (6, 2), (1, 1), (6, 2), (2, 1)]:
        s = step(s, jnp.asarray(c))
    assert int(s.to_play) == 2
    a = int(env.bot_action(s, jax.random.PRNGKey(0)))
    assert a == 3


def test_connect4_full_column_illegal():
    from lightzero_tpu.envs.board.connect4 import Connect4Env

    env = Connect4Env()
    s = env.init_state()
    step = jax.jit(env.step_single)
    for _ in range(6):
        s = step(s, jnp.asarray(3))
    legal = np.asarray(env.legal_mask(s))
    assert not legal[3] and legal[0]


def test_gomoku_win_and_bot():
    from lightzero_tpu.envs.board.gomoku import GomokuEnv

    env = GomokuEnv(board_size=6, n_in_row=4)
    s = env.init_state()
    step = jax.jit(env.step_single)
    # p1 plays 0,1,2 in row 0; p2 elsewhere; p1 completes at 3
    for a, _ in [(0, 1), (30, 2), (1, 1), (31, 2), (2, 1)]:
        s = step(s, jnp.asarray(a))
    # p2 must block at 3
    bot_a = int(env.bot_action(s, jax.random.PRNGKey(0)))
    assert bot_a == 3
    s = step(s, jnp.asarray(32))  # p2 plays elsewhere instead
    s = step(s, jnp.asarray(3))  # p1 wins
    assert bool(s.done) and int(s.winner) == 1


def test_az_policy_on_connect4():
    """The AlphaZero search must take an immediate win on connect4."""
    from lightzero_tpu.envs.board.connect4 import Connect4Env
    from lightzero_tpu.policy.alphazero import AlphaZeroPolicy

    env = Connect4Env(battle_mode="self_play_mode")
    cfg = AlphaZeroPolicy.default_config()
    cfg.model.observation_shape = (6, 7, 3)
    cfg.model.action_space_size = 7
    cfg.num_simulations = 40
    policy = AlphaZeroPolicy(cfg, env)
    params = policy.model.init_params(jax.random.PRNGKey(0))

    s = env.init_state()
    step = jax.jit(env.step_single)
    for c, p in [(0, 1), (6, 2), (1, 1), (6, 2), (2, 1), (5, 2)]:
        s = step(s, jnp.asarray(c))
    # p1 to move, win at col 3
    batched = jax.tree_util.tree_map(lambda x: x[None], s)
    out = policy.forward_eval(params, jax.random.PRNGKey(1), batched)
    assert int(out["action"][0]) == 3, np.asarray(out["visit_counts"])
