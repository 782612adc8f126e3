"""Grid Breakout UniZero v4 — reference-faithful inference context.

Round-5 finding: the reference's atari UniZero INFERS with a trimmed
context of 2*infer_context_length = 8 tokens (4 steps) while training on
20-token windows (atari_unizero_config.py:61); v1-v3 here exposed the full
24-token ring at collect/eval/search — a train/infer attention-pattern
mismatch the reference never has. v4 = the v3 optimization recipe plus
context_window=8 (the new TransformerConfig sliding-window mask), so the
model only ever attends over in-distribution short contexts at inference.

Offline localization evidence: scripts/probe_uz_offline.py (expert
distillation) — see data_uz/probe_offline*.json.
"""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_uz/breakout_grid_unizero_v4_seed0",
    env=dict(type="breakout_grid", stop_value=30,
             collector_env_num=8, evaluator_env_num=3),
    policy=dict(
        type="unizero",
        model=dict(observation_shape=(10, 10, 4), obs_type="image",
                   action_space_size=3, embed_dim=256, num_layers=2,
                   num_heads=8, max_tokens=24, context_window=8,
                   support_scale=50, num_channels=64, downsample=False),
        num_simulations=50, batch_size=256, update_per_collect=100,
        n_episode=8, eval_freq=200, num_unroll_steps=10, td_steps=5,
        learning_rate=5e-4,
        use_adaptive_entropy_weight=False,
        policy_entropy_weight=5e-3,
        predict_latent_loss_type="group_kl",
        manual_temperature_decay=True,
        threshold_training_steps_for_final_temperature=int(2.5e4),
        auto_resume=True, save_ckpt_freq=2000,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_unizero
    train_unizero(main_config, seed=0, max_env_step=int(1.5e5))
