"""MetaDrive Sampled EfficientZero (reference
zoo/metadrive/config/metadrive_sampled_efficientzero_config.py: lidar+state
vector obs, 2-dim continuous control). GATED: requires metadrive (absent —
config compiles, run raises)."""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_sez/metadrive_sez_K20_seed0",
    env=dict(env_id="metadrive", stop_value=int(1e6), collector_env_num=8,
             evaluator_env_num=3,
             env_kwargs=dict(env_config=dict(traffic_density=0.1))),
    policy=dict(
        type="sampled_efficientzero",
        model=dict(observation_shape=259, action_space_size=2,
                   continuous_action_space=True, latent_state_dim=256,
                   lstm_hidden_size=256),
        num_simulations=50, num_of_sampled_actions=20, batch_size=256,
        update_per_collect=200, n_episode=8, eval_freq=1000,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_muzero
    train_muzero(main_config, seed=0, max_env_step=int(1e6))
