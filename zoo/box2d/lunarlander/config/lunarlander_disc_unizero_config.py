"""LunarLander discrete UniZero (reference:
zoo/box2d/lunarlander/config/lunarlander_disc_unizero_config.py:
ns=50, batch=256, 4-layer/256-embed transformer WM)."""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_uz/lunarlander_disc_unizero_seed0",
    env=dict(env_id="LunarLander-v3", stop_value=240, collector_env_num=8,
             evaluator_env_num=3, n_evaluator_episode=3),
    policy=dict(
        type="unizero",
        model=dict(observation_shape=8, action_space_size=4, embed_dim=256,
                   num_layers=4, num_heads=4, max_tokens=16,
                   support_scale=300),
        num_simulations=50, num_unroll_steps=5, batch_size=256,
        update_per_collect=60, n_episode=8, eval_freq=200,
        learning_rate=0.001,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_unizero
    train_unizero(main_config, seed=0, max_env_step=int(1e6))
