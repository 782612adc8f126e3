"""CartPole UniZero (reference: zoo/classic_control/cartpole/config/
cartpole_unizero_config.py)."""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_uz/cartpole_unizero_seed0",
    env=dict(env_id="CartPole-v0", stop_value=195, collector_env_num=8,
             evaluator_env_num=3, n_evaluator_episode=3),
    policy=dict(
        type="unizero",
        model=dict(observation_shape=4, action_space_size=2, embed_dim=64,
                   num_layers=2, num_heads=4, max_tokens=16, support_scale=25),
        num_simulations=25, num_unroll_steps=5, batch_size=64,
        update_per_collect=60, n_episode=8, eval_freq=100, learning_rate=0.001,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_unizero
    train_unizero(main_config, seed=0, max_env_step=int(1e5))
