"""Pendulum manually-discretized (11 bins) + UniZero (reference:
zoo/classic_control/pendulum/config/pendulum_cont_disc_unizero_config.py:
ns=25, batch=256, each_dim_disc_size=11)."""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_uz/pendulum_disc_unizero_seed0",
    env=dict(type="pendulum", stop_value=-250, collector_env_num=8,
             evaluator_env_num=3, n_evaluator_episode=3,
             env_kwargs=dict(discrete_bins=11)),
    policy=dict(
        type="unizero",
        model=dict(observation_shape=3, action_space_size=11, embed_dim=64,
                   num_layers=2, num_heads=4, max_tokens=16,
                   support_scale=100),
        num_simulations=25, num_unroll_steps=5, batch_size=256,
        update_per_collect=60, n_episode=8, eval_freq=200,
        learning_rate=0.001,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_unizero
    train_unizero(main_config, seed=0, max_env_step=int(2e5))
