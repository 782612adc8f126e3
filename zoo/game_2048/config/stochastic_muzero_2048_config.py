"""2048 Stochastic MuZero with true chance labels (reference:
zoo/game_2048/config/stochastic_muzero_2048_config.py)."""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_stoch/game_2048_stochastic_muzero_seed0",
    env=dict(env_id="game_2048", stop_value=int(1e9), collector_env_num=8,
             evaluator_env_num=3, n_evaluator_episode=3),
    policy=dict(
        type="stochastic_muzero",
        model=dict(observation_shape=4 * 4 * 16, action_space_size=4,
                   chance_space_size=32, latent_state_dim=256, support_scale=300),
        num_simulations=50, batch_size=256, update_per_collect=100, n_episode=8,
        eval_freq=200, use_ture_chance_label_in_chance_encoder=True,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_muzero
    train_muzero(main_config, seed=0, max_env_step=int(1e6))
