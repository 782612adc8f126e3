"""Memory env UniZero at memory_length 100 (reference zoo/memory/ scales
memory_length up to 500 — the long-context stress test, SURVEY.md §5.7).
The full episode (104 steps, 210 tokens) lives in the ring-KV context."""
from lightzero_tpu.config import Config

memory_length = 100

main_config = Config(dict(
    exp_name=f"data_uz/memory{memory_length}_unizero_seed0",
    env=dict(env_id="memory", stop_value=0.95,
             collector_env_num=8, evaluator_env_num=4, n_evaluator_episode=8,
             env_kwargs=dict(num_cues=4, memory_length=memory_length)),
    policy=dict(
        type="unizero",
        model=dict(observation_shape=3 + 4 + 1, action_space_size=4,
                   embed_dim=96, num_layers=2, num_heads=4,
                   max_tokens=2 * (memory_length + 6),  # full episode in context
                   support_scale=5),
        num_simulations=15,
        num_unroll_steps=memory_length + 2,  # whole episode per training sequence
        td_steps=memory_length + 2,
        batch_size=32, update_per_collect=50, n_episode=8,
        eval_freq=150, learning_rate=0.001, discount_factor=1.0,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_unizero
    train_unizero(main_config, seed=0, max_env_step=int(3e5))
