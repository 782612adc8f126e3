"""LunarLander discrete + DISCRETE Sampled UniZero (reference
lzero/policy/sampled_unizero.py continuous_action_space=False branch over
the transformer world model: K=3 of 4 actions sampled without replacement
from the categorical head, CE-over-sampled policy loss). Transformer sizes
follow the reference's vector-obs sampled-unizero recipe
(pendulum_cont_sampled_unizero_config.py:49-70: embed 256 / 2 layers /
8 heads, max_tokens = 2*num_unroll_steps, LN for non-board vector obs)."""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_suz/lunarlander_disc_sampled_unizero_seed0",
    env=dict(type="lunarlander", stop_value=200, collector_env_num=8,
             evaluator_env_num=3, n_evaluator_episode=3),
    policy=dict(
        type="sampled_unizero",
        model=dict(observation_shape=8, action_space_size=4,
                   continuous_action_space=False,
                   embed_dim=256, num_layers=2, num_heads=8,
                   max_tokens=22,  # 2*K+2 >= the 21-token training window
                   final_norm_option_in_encoder="LayerNorm",
                   support_scale=300),
        num_of_sampled_actions=3,
        num_simulations=25, batch_size=64, update_per_collect=100,
        n_episode=8, game_segment_length=50, num_unroll_steps=10,
        td_steps=5, discount_factor=0.99, learning_rate=1e-4,
        grad_clip_value=5.0, use_adaptive_entropy_weight=False,
        policy_entropy_weight=5e-2, eval_freq=500,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_unizero
    train_unizero(main_config, seed=0, max_env_step=int(5e5))
