"""BipedalWalker Sampled UniZero (reference:
zoo/box2d/bipedalwalker/config/bipedalwalker_cont_sampled_unizero_config.py)."""
from lightzero_tpu.config import Config

K = 20

main_config = Config(dict(
    exp_name="data_suz/bipedalwalker_cont_suz_seed0",
    env=dict(env_id="BipedalWalker-v3", stop_value=300,
             collector_env_num=8, evaluator_env_num=3, n_evaluator_episode=3),
    policy=dict(
        type="sampled_unizero",
        model=dict(observation_shape=24, action_space_size=4,
                   continuous_action_space=True, embed_dim=128,
                   num_layers=2, num_heads=4, max_tokens=16,
                   support_scale=300),
        num_simulations=50, num_of_sampled_actions=K, batch_size=64,
        update_per_collect=60, n_episode=8, eval_freq=200,
        learning_rate=0.001,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_unizero
    train_unizero(main_config, seed=0, max_env_step=int(1e6))
