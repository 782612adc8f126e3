"""AlphaZero policy + self-play pipeline tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [pytest.mark.unittest, pytest.mark.slow]  # compile-heavy: not in the fast tier


def test_az_search_blocks_immediate_loss():
    """With enough simulations the env-simulator search must see that only
    blocking avoids a loss, even with an untrained net."""
    from lightzero_tpu.envs.board.tictactoe import TicTacToeEnv
    from lightzero_tpu.policy.alphazero import AlphaZeroPolicy

    env = TicTacToeEnv(battle_mode="self_play_mode")
    cfg = AlphaZeroPolicy.default_config()
    cfg.num_simulations = 60
    policy = AlphaZeroPolicy(cfg, env)
    params = policy.model.init_params(jax.random.PRNGKey(0))

    from tests_helpers_boards import batched_state

    # player 2 to move; player 1 threatens at cell 2
    s = batched_state([[1, 1, 0, 2, 0, 0, 0, 0, 0]], to_play=[2])
    out = policy.forward_eval(params, jax.random.PRNGKey(1), s)
    assert int(out["action"][0]) == 2, np.asarray(out["visit_counts"])


def test_az_search_takes_immediate_win():
    from lightzero_tpu.envs.board.tictactoe import TicTacToeEnv
    from lightzero_tpu.policy.alphazero import AlphaZeroPolicy

    env = TicTacToeEnv(battle_mode="self_play_mode")
    cfg = AlphaZeroPolicy.default_config()
    cfg.num_simulations = 60
    policy = AlphaZeroPolicy(cfg, env)
    params = policy.model.init_params(jax.random.PRNGKey(0))

    from tests_helpers_boards import batched_state

    # player 1 can win at 2 right now
    s = batched_state([[1, 1, 0, 2, 2, 0, 0, 0, 0]], to_play=[1])
    out = policy.forward_eval(params, jax.random.PRNGKey(1), s)
    assert int(out["action"][0]) == 2, np.asarray(out["visit_counts"])


def test_az_train_smoke(tmp_path):
    from lightzero_tpu.config import Config
    from lightzero_tpu.entry.train_alphazero import train_alphazero

    cfg = Config(
        dict(
            exp_name=str(tmp_path / "az_smoke"),
            env=dict(
                type="tictactoe",
                stop_value=2.0,  # unreachable
                collector_env_num=4,
                evaluator_env_num=2,
                n_evaluator_episode=2,
            ),
            policy=dict(
                model=dict(observation_shape=(3, 3, 3), action_space_size=9, num_channels=16),
                num_simulations=8,
                batch_size=32,
                update_per_collect=2,
                n_episode=2,
                eval_freq=1000,
            ),
        )
    )
    policy, state, stats = train_alphazero(cfg, seed=0, max_env_step=400, max_train_iter=10)
    assert int(state.train_iter) > 0
