"""Atari MuZero (reference: zoo/atari/config/atari_muzero_config.py —
Pong: 50 sims, batch 256, SSL on, conv ResNet encoder, frame-stack 4).

Requires ale_py (not present in the build image; the env gates on
lightzero_tpu.envs.atari.is_available())."""
from lightzero_tpu.config import Config

env_id = "ALE/Pong-v5"
num_simulations = 50
max_env_step = int(5e5)

main_config = Config(dict(
    exp_name=f"data_muzero/pong_muzero_ns{num_simulations}_seed0",
    env=dict(env_id=env_id, stop_value=20, collector_env_num=8,
             evaluator_env_num=3, n_evaluator_episode=3),
    policy=dict(
        model=dict(
            observation_shape=(96, 96, 12),  # 4-frame stack x RGB, NHWC
            action_space_size=6,
            model_type="conv",
            num_channels=64,
            num_res_blocks=1,
            downsample=True,
            self_supervised_learning_loss=True,
        ),
        frame_stack_num=4,
        num_simulations=num_simulations,
        batch_size=256,
        update_per_collect=None,  # replay_ratio-driven
        replay_ratio=0.25,
        n_episode=8,
        eval_freq=int(2e3),
        ssl_loss_weight=2,
        optim_type="SGD",
        learning_rate=0.2,
        piecewise_decay_lr_scheduler=True,
        threshold_training_steps_for_final_lr=int(5e4),
        manual_temperature_decay=True,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.envs.atari import is_available
    assert is_available(), "ale_py is not installed in this image"
    from lightzero_tpu.entry import train_muzero
    train_muzero(main_config, seed=0, max_env_step=max_env_step)
