"""Memory env UniZero at memory_length 100 — round-4 retune. The round-3
run (data_uz/memory100_unizero_seed0) was capped at 32k env steps and
topped out at eval 0.5; len-10 needed 153k steps to solve, so the cap was
the first-order problem. v2 follows the reference memory config's scale
direction (memory_unizero_config.py: embed 256 / 4 layers / 50 sims /
AdamW 1e-4 / 1e6 steps at memory_length 60) while keeping sizes at what
one v5e chip collects fast enough to reach ~200k steps in a queue slot:
embed 128 / 3 layers / 25 sims / lr 3e-4. auto_resume + frequent periodic
checkpoints let a trimmed queue slot continue instead of restarting."""
from lightzero_tpu.config import Config

memory_length = 100

main_config = Config(dict(
    exp_name=f"data_uz/memory{memory_length}_unizero_v2_seed0",
    env=dict(env_id="memory", stop_value=0.95,
             collector_env_num=8, evaluator_env_num=4, n_evaluator_episode=8,
             env_kwargs=dict(num_cues=4, memory_length=memory_length)),
    policy=dict(
        type="unizero",
        model=dict(observation_shape=3 + 4 + 1, action_space_size=4,
                   embed_dim=128, num_layers=3, num_heads=4,
                   max_tokens=2 * (memory_length + 6),  # full episode in context
                   support_scale=5),
        num_simulations=25,
        num_unroll_steps=memory_length + 2,  # whole episode per training sequence
        td_steps=memory_length + 2,
        batch_size=48, update_per_collect=40, n_episode=8,
        eval_freq=150, learning_rate=3e-4, discount_factor=0.99,
        auto_resume=True, save_ckpt_freq=1500,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_unizero
    train_unizero(main_config, seed=0, max_env_step=int(4e5))
