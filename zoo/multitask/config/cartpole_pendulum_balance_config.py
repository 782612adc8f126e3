"""Two-task curriculum/balance multitask UniZero (reference:
train_unizero_multitask_balance_segment_ddp.py): CartPole + bang-bang
Pendulum sharing one world model with task embeddings + CurriculumLoRA
stage switching. Tasks must share obs/action dims (the reference pads
Atari frames; here pendulum's 3-dim obs is zero-padded to 4 via
PadVectorObs and discretized to 2 actions so both tasks are pure-JAX and
dimension-compatible)."""
from lightzero_tpu.config import Config

_shared_policy = dict(
    type="unizero",
    model=dict(observation_shape=4, action_space_size=2, embed_dim=64,
               num_layers=2, num_heads=4, max_tokens=16, support_scale=25,
               num_tasks=2, lora_r=4, curriculum_stage_num=2),
    num_simulations=25, batch_size=64, update_per_collect=60, n_episode=4,
    eval_freq=50, num_unroll_steps=5, td_steps=5, learning_rate=1e-3,
    stage_solved_frac=0.5,
)

task_configs = [
    Config(dict(
        exp_name="data_mt/balance_cartpole_pendulum_seed0",
        env=dict(type="cartpole", stop_value=195, solved_threshold=195,
                 collector_env_num=4, evaluator_env_num=2),
        policy=dict(_shared_policy),
    )),
    Config(dict(
        exp_name="data_mt/balance_cartpole_pendulum_seed0",
        env=dict(type="pendulum", stop_value=-300, solved_threshold=-400,
                 pad_obs_to=4, env_kwargs=dict(discrete_bins=2),
                 collector_env_num=4, evaluator_env_num=2),
        policy=dict(_shared_policy),
    )),
]

if __name__ == "__main__":
    from lightzero_tpu.entry import train_multitask_balance
    train_multitask_balance(task_configs, seed=0, max_env_step=int(5e5))
