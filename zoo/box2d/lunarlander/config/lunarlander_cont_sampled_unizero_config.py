"""LunarLanderContinuous Sampled UniZero (reference:
zoo/box2d/lunarlander/config/lunarlander_cont_sampled_unizero_config.py:
K=20, ns=50, transformer WM; lr follows the solved pendulum
sampled-unizero recipe — 1e-4 leaves the mu-head at init, see
data_suz/pendulum_sampled_unizero_k16_lr1e3_seed0)."""
from lightzero_tpu.config import Config

K = 20

main_config = Config(dict(
    exp_name="data_suz/lunarlander_cont_sampled_unizero_seed0",
    env=dict(env_id="LunarLanderContinuous-v3", stop_value=240,
             collector_env_num=8, evaluator_env_num=3, n_evaluator_episode=3),
    policy=dict(
        type="sampled_unizero",
        model=dict(observation_shape=8, action_space_size=2,
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
