"""Pendulum Sampled-UniZero (single-task) — isolates the ScaleZero stack's
sampled-continuous UniZero path from the multitask aggregation (reference
lzero/policy/sampled_unizero.py; zoo pendulum sampled configs).

Uses exactly the scalezero suite's per-task knobs (K=16 sampled actions,
50 sims, support_scale 100, AdamW 1e-4) so a learning curve here validates
the round-3 sigma-head fixes end-to-end before the 3-task suite run; a
flat curve localizes the suite's round-3 flatness to THIS policy.
"""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_suz/pendulum_sampled_unizero_k16_seed0",
    env=dict(type="pendulum", stop_value=-250,
             collector_env_num=4, evaluator_env_num=2),
    policy=dict(
        type="sampled_unizero",
        model=dict(
            observation_shape=3,
            action_space_size=1,  # continuous action dim
            continuous_action_space=True,
            embed_dim=64,
            num_layers=2,
            num_heads=4,
            max_tokens=16,
            support_scale=100,  # pendulum h(value) reaches ~-54; 25 clips
        ),
        num_of_sampled_actions=16,
        num_simulations=50,
        batch_size=192,
        update_per_collect=60,
        n_episode=4,
        eval_freq=40,
        num_unroll_steps=5,
        td_steps=5,
        learning_rate=1e-4,
        use_adaptive_entropy_weight=False,
        policy_entropy_weight=5e-3,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_unizero

    train_unizero(main_config, seed=0, max_env_step=int(1e5))
