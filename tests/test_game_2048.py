"""2048 env tests (mirrors reference zoo/game_2048/envs tests)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightzero_tpu.envs.game_2048 import (
    G2048State,
    Game2048Env,
    _slide_board,
    _slide_row_left,
)

pytestmark = [pytest.mark.unittest, pytest.mark.slow]  # compile-heavy: not in the fast tier


def test_slide_row_merges():
    cases = [
        ([1, 1, 0, 0], [2, 0, 0, 0], 4.0),
        ([1, 1, 1, 0], [2, 1, 0, 0], 4.0),
        ([1, 1, 1, 1], [2, 2, 0, 0], 8.0),
        ([2, 1, 1, 2], [2, 2, 2, 0], 4.0),
        ([0, 0, 0, 0], [0, 0, 0, 0], 0.0),
        ([3, 0, 0, 3], [4, 0, 0, 0], 16.0),
        ([1, 2, 3, 4], [1, 2, 3, 4], 0.0),
    ]
    for row, want, want_r in cases:
        out, r = _slide_row_left(jnp.asarray(row, jnp.int32))
        assert out.tolist() == want, (row, out.tolist())
        assert float(r) == want_r, (row, float(r))


def test_slide_directions():
    board = jnp.asarray(
        [[1, 0, 0, 1],
         [0, 0, 0, 0],
         [0, 0, 0, 0],
         [1, 0, 0, 1]], jnp.int32)
    # left (3): rows merge to col 0
    nb, r = _slide_board(board, jnp.asarray(3))
    assert nb[0].tolist() == [2, 0, 0, 0] and nb[3].tolist() == [2, 0, 0, 0]
    # up (0): cols merge to row 0
    nb, r = _slide_board(board, jnp.asarray(0))
    assert nb[:, 0].tolist() == [2, 0, 0, 0] and nb[:, 3].tolist() == [2, 0, 0, 0]
    # right (1)
    nb, r = _slide_board(board, jnp.asarray(1))
    assert nb[0].tolist() == [0, 0, 0, 2]
    # down (2)
    nb, r = _slide_board(board, jnp.asarray(2))
    assert nb[:, 0].tolist() == [0, 0, 0, 2]


def test_env_step_spawns_and_chance():
    env = Game2048Env()
    s, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (4, 4, 16)
    assert int((np.asarray(s.board) != 0).sum()) == 2
    legal = np.asarray(env.legal_mask(s))
    a = int(np.nonzero(legal)[0][0])
    step = jax.jit(env.step)(s, jnp.asarray(a), jax.random.PRNGKey(1))
    # a tile was spawned -> count changed or merged (2 -> between 2 and 3)
    n = int((np.asarray(step.state.board) != 0).sum())
    assert 1 <= n <= 3
    chance = int(step.chance)
    cell, is4 = chance // 2, chance % 2
    spawned_exp = 2 if is4 else 1
    assert 0 <= cell < 16


def test_full_random_game_terminates():
    env = Game2048Env(max_episode_steps=300)
    rng = jax.random.PRNGKey(3)
    s, _ = env.reset(rng)
    step_fn = jax.jit(env.step)
    done = False
    for i in range(301):
        rng, a_rng, s_rng = jax.random.split(rng, 3)
        legal = env.legal_mask(s)
        a = jax.random.categorical(a_rng, jnp.where(legal, 0.0, -jnp.inf))
        st = step_fn(s, a, s_rng)
        s = st.state
        if bool(st.done):
            done = True
            break
    assert done or i == 300


def test_stochastic_policy_collect_and_learn():
    from lightzero_tpu.policy.stochastic_muzero import StochasticMuZeroPolicy
    from lightzero_tpu.policy.muzero import TrainBatch

    cfg = StochasticMuZeroPolicy.default_config()
    cfg.model.observation_shape = 4 * 4 * 16
    cfg.model.action_space_size = 4
    cfg.model.chance_space_size = 32
    cfg.model.latent_state_dim = 32
    cfg.model.support_scale = 10
    cfg.num_simulations = 6
    policy = StochasticMuZeroPolicy(cfg)
    params = policy.model.init_params(jax.random.PRNGKey(0), batch_size=2)

    obs = jnp.ones((2, 4, 4, 16))
    legal = jnp.ones((2, 4), bool)
    out = policy.forward_collect(params, jax.random.PRNGKey(1), obs, legal)
    assert out["action"].shape == (2,)
    assert out["visit_counts"].shape == (2, 4)
    assert int(np.asarray(out["visit_counts"]).sum()) == 12

    K = cfg.num_unroll_steps
    B = 4
    batch = TrainBatch(
        obs=jnp.ones((B, K + 1, 4, 4, 16)),
        actions=jnp.zeros((B, K), jnp.int32),
        mask=jnp.ones((B, K)),
        target_reward=jnp.ones((B, K)),
        target_value=jnp.ones((B, K + 1)),
        target_policy=jnp.full((B, K + 1, 4), 0.25),
        weights=jnp.ones((B,)),
        chance=jnp.zeros((B, K), jnp.int32),
    )
    state = policy.init_train_state(jax.random.PRNGKey(2))
    state, logs, priority = policy.forward_learn(state, batch)
    assert np.isfinite(float(logs["total_loss"]))
    assert np.isfinite(float(logs["afterstate_policy_loss"]))
    assert np.isfinite(float(logs["commitment_loss"]))
