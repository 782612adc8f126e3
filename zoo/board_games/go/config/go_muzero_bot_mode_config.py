"""Go 9x9 MuZero (learned model) vs rule bot (reference keeps AlphaZero for
go; MuZero on go exercises the conv dynamics with the 82-way action space)."""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_mz/go9_muzero_ns100_seed0",
    env=dict(type="go", board_size=9, komi=7.5,
             battle_mode="play_with_bot_mode", stop_value=0.99,
             collector_env_num=8, evaluator_env_num=5),
    policy=dict(
        type="muzero", env_type="board_games",
        model=dict(observation_shape=(9, 9, 3), action_space_size=82,
                   model_type="conv", downsample=False, num_channels=64, num_res_blocks=2,
                   support_scale=10),
        discount_factor=1.0, num_simulations=100, batch_size=256,
        update_per_collect=100, n_episode=8, eval_freq=200,
        manual_temperature_decay=True,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_muzero
    train_muzero(main_config, seed=0, max_env_step=int(2e6))
