"""SpaceInvaders-grid EfficientZero (conv + value-prefix LSTM) — MinAtar-
class image env standing in for the reference Atari EfficientZero row
(reference zoo/atari/config/atari_efficientzero_config.py; env:
lightzero_tpu/envs/minatar_like.py)."""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_ez/space_invaders_grid_ez_seed0",
    env=dict(type="space_invaders_grid", stop_value=18,
             collector_env_num=8, evaluator_env_num=3),
    policy=dict(
        type="efficientzero",
        model=dict(observation_shape=(10, 10, 4), action_space_size=4,
                   model_type="conv", num_channels=32, num_res_blocks=1,
                   downsample=False, support_scale=50,
                   lstm_hidden_size=256),
        ssl_loss_weight=2.0,
        num_simulations=25, batch_size=256, update_per_collect=100,
        n_episode=8, eval_freq=200, manual_temperature_decay=True,
        auto_resume=True, save_ckpt_freq=3000,
        threshold_training_steps_for_final_temperature=int(5e4),
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_muzero
    train_muzero(main_config, seed=0, max_env_step=int(3e5))
