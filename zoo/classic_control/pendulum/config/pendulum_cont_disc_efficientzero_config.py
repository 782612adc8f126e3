"""Pendulum manually-discretized (11 bins) + EfficientZero (reference:
zoo/classic_control/pendulum/config/pendulum_cont_disc_efficientzero_config.py:
ns=50, upc=200, batch=256, each_dim_disc_size=11)."""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_sez/pendulum_disc_efficientzero_seed0",
    env=dict(type="pendulum", stop_value=-250, collector_env_num=8,
             evaluator_env_num=3, n_evaluator_episode=3,
             env_kwargs=dict(discrete_bins=11)),
    policy=dict(
        type="efficientzero",
        model=dict(observation_shape=3, action_space_size=11,
                   model_type="mlp", latent_state_dim=128),
        num_simulations=50, batch_size=256, update_per_collect=200,
        n_episode=8, eval_freq=200,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_muzero
    train_muzero(main_config, seed=0, max_env_step=int(2e5))
