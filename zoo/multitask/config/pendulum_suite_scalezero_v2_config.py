"""ScaleZero 3-task suite v2 — the round-4 root-cause rebuild (reference
lzero/policy/sampled_unizero_multitask.py +
train_unizero_multitask_balance_segment_ddp.py).

Three continuous-control tasks sharing ONE task-conditioned transformer
world model with K sampled tanh-Gaussian actions per search node:
  task 0: standard Pendulum       (g=10, torque 2.0)
  task 1: heavy-gravity Pendulum  (g=14, torque 2.0) — needs energy pumping
  task 2: weak-motor Pendulum     (g=8,  torque 1.2) — underactuated swings

v1 (data_mt/pendulum_suite_scalezero_seed0) spiked to solved (task0 -63,
task2 -0.9) then collapsed back to random. Two root causes fixed since:
  1. DENSITY pUCT priors over sampled candidates (the python-ptree
     behavior) create a sigma-collapse loop; the reference's production
     C++ tree uses UNIFORM priors (cnode.cpp:1016 — "uniform is very
     important to the performance of sampled algo"). Now the default.
  2. Model scale/recipe: v1 used embed 64 + SimNorm + 11-token train
     window inside a 16-token inference ring (untrained RoPE distances).
     v2 mirrors the reference's pendulum sampled-unizero recipe
     (pendulum_cont_sampled_unizero_config.py:49-70): embed 256, LN
     latents, unroll 10 with max_tokens 22 >= the 21-token window,
     discount 0.99, entropy weight 5e-2, temperature decay, cosine LR.
"""
from lightzero_tpu.config import Config

_shared_policy = dict(
    type="sampled_unizero_multitask",
    model=dict(
        observation_shape=3,
        action_space_size=1,  # continuous action dim
        continuous_action_space=True,
        embed_dim=256,
        num_layers=2,
        num_heads=8,
        max_tokens=22,  # 2*K+2 >= the 21-token training window
        final_norm_option_in_encoder="LayerNorm",
        support_scale=100,
        num_tasks=3,
        lora_r=4,
        curriculum_stage_num=2,
    ),
    task_num=3,
    num_of_sampled_actions=20,
    num_simulations=25,
    batch_size=96,
    update_per_collect=100,
    n_episode=3,
    game_segment_length=50,
    eval_freq=40,
    num_unroll_steps=10,
    td_steps=5,
    discount_factor=0.99,
    learning_rate=1e-4,
    cos_lr_scheduler=True,
    cos_lr_decay_steps=int(5e4),
    manual_temperature_decay=True,
    threshold_training_steps_for_final_temperature=int(2.5e4),
    grad_clip_value=5.0,
    stage_solved_frac=0.6,
    use_adaptive_entropy_weight=False,
    policy_entropy_weight=5e-2,
    predict_latent_loss_type="mse",
    auto_resume=True,
    save_ckpt_freq=1200,
)

task_configs = [
    Config(dict(
        exp_name="data_mt/pendulum_suite_scalezero_v2_seed0",
        env=dict(type="pendulum", stop_value=-250, solved_threshold=-400,
                 collector_env_num=4, evaluator_env_num=2),
        policy=dict(_shared_policy),
    )),
    Config(dict(
        exp_name="data_mt/pendulum_suite_scalezero_v2_seed0",
        env=dict(type="pendulum", stop_value=-350, solved_threshold=-600,
                 env_kwargs=dict(gravity=14.0),
                 collector_env_num=4, evaluator_env_num=2),
        policy=dict(_shared_policy),
    )),
    Config(dict(
        exp_name="data_mt/pendulum_suite_scalezero_v2_seed0",
        env=dict(type="pendulum", stop_value=-350, solved_threshold=-600,
                 env_kwargs=dict(gravity=8.0, max_torque=1.2),
                 collector_env_num=4, evaluator_env_num=2),
        policy=dict(_shared_policy),
    )),
]

if __name__ == "__main__":
    from lightzero_tpu.entry import train_multitask_balance

    train_multitask_balance(task_configs, seed=0, max_env_step=int(3e5))
