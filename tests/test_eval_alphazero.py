"""eval_alphazero entry (reference lzero/entry/eval_alphazero.py):
checkpoint-less eval of a random-init AZ net vs the rule bot."""
import pytest

from lightzero_tpu.config import Config

pytestmark = [pytest.mark.unittest, pytest.mark.slow]


def test_eval_alphazero_runs_vs_bot(tmp_path):
    from lightzero_tpu.entry import eval_alphazero

    cfg = Config(dict(
        exp_name=str(tmp_path / "az_eval"),
        env=dict(type="tictactoe", evaluator_env_num=2),
        policy=dict(type="alphazero", num_simulations=4,
                    model=dict(observation_shape=(3, 3, 3), action_space_size=9,
                               num_channels=8, num_res_blocks=1)),
    ))
    res = eval_alphazero(cfg, seed=0, n_episodes=2)
    assert "mean_return" in res and "win_rate" in res
    assert -1.0 <= res["mean_return"] <= 1.0
    assert len(res["episode_returns"]) >= 2
