"""MuJoCo Sampled EfficientZero (reference
zoo/mujoco/config/mujoco_sampled_efficientzero_config.py: Hopper-v3 obs 11
/ act 3, K=20 sampled actions). gymnasium[mujoco] ships in this image,
so this config is RUNNABLE via the host vec-env path."""
from lightzero_tpu.config import Config

env_id = "Hopper-v4"
obs_shape, act_dim = 11, 3

main_config = Config(dict(
    exp_name=f"data_sez/{env_id}_sez_K20_ns50_seed0",
    env=dict(env_id=env_id, stop_value=int(1e6), collector_env_num=8,
             evaluator_env_num=3),
    policy=dict(
        type="sampled_efficientzero",
        model=dict(observation_shape=obs_shape, action_space_size=act_dim,
                   continuous_action_space=True, latent_state_dim=256,
                   lstm_hidden_size=256),
        num_simulations=50, num_of_sampled_actions=20, batch_size=256,
        update_per_collect=200, n_episode=8, eval_freq=1000,
        discount_factor=0.997, td_steps=5,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_muzero
    train_muzero(main_config, seed=0, max_env_step=int(1e6))
