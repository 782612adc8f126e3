"""ScaleZero 3-task suite v3 — the honest re-verification run (round-4
verdict, missing #4 / weak #2).

v2 improved all three tasks (bests −62/−122/−63) but its "ALL 3 TASKS
SOLVED" claim was gated at solved_threshold −400/−600 while every other
pendulum result in this repo uses −250, and no checkpoint was saved so the
claim could not be re-verified. v3 = the same recipe with:

  - solved_threshold = stop_value = −250 on ALL tasks (the repo-wide bar;
    reference balance-entry gate:
    lzero/entry/train_unizero_multitask_balance_segment_ddp.py:416-460);
  - ckpt_best + durable params_best export on every new best cross-task
    mean (train_multitask_balance now saves them);
  - after the run: >=10-episode per-task re-eval from params_best via
    scripts/eval_scalezero_best.py -> data_mt/.../eval_verdict.json.
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
        exp_name="data_mt/pendulum_suite_scalezero_v3_seed0",
        env=dict(type="pendulum", stop_value=-250, solved_threshold=-250,
                 collector_env_num=4, evaluator_env_num=2),
        policy=dict(_shared_policy),
    )),
    Config(dict(
        exp_name="data_mt/pendulum_suite_scalezero_v3_seed0",
        env=dict(type="pendulum", stop_value=-250, solved_threshold=-250,
                 env_kwargs=dict(gravity=14.0),
                 collector_env_num=4, evaluator_env_num=2),
        policy=dict(_shared_policy),
    )),
    Config(dict(
        exp_name="data_mt/pendulum_suite_scalezero_v3_seed0",
        env=dict(type="pendulum", stop_value=-250, solved_threshold=-250,
                 env_kwargs=dict(gravity=8.0, max_torque=1.2),
                 collector_env_num=4, evaluator_env_num=2),
        policy=dict(_shared_policy),
    )),
]

if __name__ == "__main__":
    from lightzero_tpu.entry import train_multitask_balance

    train_multitask_balance(task_configs, seed=0, max_env_step=int(3e5))
