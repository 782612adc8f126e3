"""Atari EfficientZero (reference:
zoo/atari/config/atari_efficientzero_config.py). Requires ale_py."""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_ez/pong_efficientzero_seed0",
    env=dict(env_id="ALE/Pong-v5", stop_value=20, collector_env_num=8,
             evaluator_env_num=3, n_evaluator_episode=3),
    policy=dict(
        type="efficientzero",
        model=dict(
            observation_shape=(96, 96, 12),
            action_space_size=6,
            model_type="conv",
            num_channels=64,
            lstm_hidden_size=512,
        ),
        frame_stack_num=4,
        num_simulations=50,
        batch_size=256,
        replay_ratio=0.25,
        n_episode=8,
        eval_freq=int(2e3),
        lstm_horizon_len=5,
        optim_type="SGD",
        learning_rate=0.2,
        piecewise_decay_lr_scheduler=True,
        manual_temperature_decay=True,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.envs.atari import is_available
    assert is_available(), "ale_py is not installed in this image"
    from lightzero_tpu.entry import train_muzero
    train_muzero(main_config, seed=0, max_env_step=int(5e5))
