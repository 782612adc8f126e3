"""Grid Breakout EfficientZero (conv + value-prefix LSTM + SSL)."""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_ez/breakout_grid_efficientzero_seed0",
    env=dict(type="breakout_grid", stop_value=30,
             collector_env_num=8, evaluator_env_num=3),
    policy=dict(
        type="efficientzero",
        model=dict(observation_shape=(10, 10, 4), action_space_size=3,
                   model_type="conv", num_channels=32, num_res_blocks=1,
                   downsample=False, support_scale=50, lstm_hidden_size=128),
        ssl_loss_weight=2.0, lstm_horizon_len=5,
        num_simulations=25, batch_size=256, update_per_collect=100,
        n_episode=8, eval_freq=200, manual_temperature_decay=True,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_muzero
    train_muzero(main_config, seed=0, max_env_step=int(5e5))
