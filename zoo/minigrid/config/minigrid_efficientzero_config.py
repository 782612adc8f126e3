"""MiniGrid EfficientZero (reference
zoo/minigrid/config/minigrid_efficientzero_config.py: Empty-8x8, flat
2835-dim obs). GATED: requires minigrid (absent in image)."""
from lightzero_tpu.config import Config

env_id = "MiniGrid-Empty-8x8-v0"

main_config = Config(dict(
    exp_name="data_sez/minigrid_empty8_efficientzero_seed0",
    env=dict(env_id=env_id, stop_value=0.96, collector_env_num=8,
             evaluator_env_num=3, n_evaluator_episode=3),
    policy=dict(
        type="efficientzero",
        model=dict(observation_shape=2835, action_space_size=7,
                   model_type="mlp", latent_state_dim=256),
        num_simulations=50, batch_size=256, update_per_collect=200,
        n_episode=8, eval_freq=1000,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_muzero
    train_muzero(main_config, seed=0, max_env_step=int(1e6))
