"""Memory env UniZero at memory_length 250 — long-context stretch row.

Scales the solved len-100 recipe (memory100_unizero_v2_config.py: eval 1.0
at 98k env steps on one v5e chip) toward the reference's hardest published
memory rows (reference zoo/memory/config/ benchmarks memory_length up to
500). The whole episode still fits the ring-KV context (max_tokens 512);
batch drops 48 -> 24 to keep the (B, unroll≈252, embed) training activations
inside HBM at the longer sequence. auto_resume + frequent checkpoints +
durable params_best exports let trimmed queue slots accumulate progress
across rounds instead of restarting.
"""
from lightzero_tpu.config import Config

memory_length = 250

main_config = Config(dict(
    exp_name=f"data_uz/memory{memory_length}_unizero_seed0",
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
        batch_size=24, update_per_collect=40, n_episode=8,
        eval_freq=150, learning_rate=3e-4, discount_factor=0.99,
        auto_resume=True, save_ckpt_freq=1500,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_unizero
    train_unizero(main_config, seed=0, max_env_step=int(6e5))
