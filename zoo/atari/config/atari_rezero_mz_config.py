"""Atari ReZero-MuZero (reference: zoo/atari/config/atari_rezero_mz_config.py
— buffer reanalyze + reuse-search; arXiv:2404.16364).

Requires ale_py (gated)."""
from lightzero_tpu.config import Config

env_id = "ALE/Pong-v5"

main_config = Config(dict(
    exp_name="data_rezero/pong_rezero_mz_seed0",
    env=dict(env_id=env_id, stop_value=20, collector_env_num=8,
             evaluator_env_num=3, n_evaluator_episode=3),
    policy=dict(
        type="muzero",
        model=dict(observation_shape=(96, 96, 12), action_space_size=6,
                   model_type="conv", num_channels=64, num_res_blocks=1,
                   downsample=True, self_supervised_learning_loss=True),
        frame_stack_num=4,
        num_simulations=50, batch_size=256, replay_ratio=0.25, n_episode=8,
        eval_freq=int(2e3), ssl_loss_weight=2,
        buffer_reanalyze_freq=1.0, reanalyze_batch_size=160,
        reanalyze_partition=0.75, reuse_search=True,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_rezero
    train_rezero(main_config, seed=0, max_env_step=int(5e5))
