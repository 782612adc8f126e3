"""MiniGrid MuZero+SSL (reference zoo/minigrid/config/minigrid_muzero_config.py:
MiniGrid-Empty-8x8-v0, flat 2835-dim obs, 7 actions). GATED: requires the
minigrid package (absent from this image — config compiles, run raises)."""
from lightzero_tpu.config import Config

env_id = "MiniGrid-Empty-8x8-v0"

main_config = Config(dict(
    exp_name=f"data_mz/{env_id}_muzero_ns50_seed0",
    env=dict(env_id=env_id, stop_value=0.96, collector_env_num=8,
             evaluator_env_num=3, env_kwargs=dict(max_step=300)),
    policy=dict(
        type="muzero",
        model=dict(observation_shape=2835, action_space_size=7, model_type="mlp",
                   latent_state_dim=512, self_supervised_learning_loss=True),
        num_simulations=50, td_steps=5, discount_factor=0.997,
        batch_size=256, update_per_collect=200, n_episode=8,
        eval_freq=1000, ssl_loss_weight=2, learning_rate=0.003,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_muzero
    train_muzero(main_config, seed=0, max_env_step=int(1e6))
