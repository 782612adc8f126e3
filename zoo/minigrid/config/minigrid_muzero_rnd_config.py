"""MiniGrid MuZero + RND intrinsic reward (reference
zoo/minigrid/config/minigrid_muzero_rnd_config.py — exploration-hard
FourRooms). GATED on the minigrid package."""
from lightzero_tpu.config import Config

env_id = "MiniGrid-FourRooms-v0"

main_config = Config(dict(
    exp_name=f"data_mz/{env_id}_muzero_rnd_ns50_seed0",
    env=dict(env_id=env_id, stop_value=0.96, collector_env_num=8,
             evaluator_env_num=3, env_kwargs=dict(max_step=300)),
    policy=dict(
        type="muzero",
        model=dict(observation_shape=2835, action_space_size=7, model_type="mlp",
                   latent_state_dim=512, self_supervised_learning_loss=True),
        num_simulations=50, td_steps=5, batch_size=256, update_per_collect=200,
        n_episode=8, eval_freq=1000, ssl_loss_weight=2,
    ),
    reward_model=dict(type="rnd", intrinsic_reward_weight=0.003,
                      input_type="obs", hidden_dim=256),
))

if __name__ == "__main__":
    from lightzero_tpu.entry.train_muzero_with_reward_model import (
        train_muzero_with_reward_model,
    )
    train_muzero_with_reward_model(main_config, seed=0, max_env_step=int(1e6))
