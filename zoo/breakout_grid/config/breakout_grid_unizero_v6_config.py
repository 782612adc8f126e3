"""Grid Breakout UniZero v6 — drift-corrected world model.

Round-5 causal chain, each link measured:
1. Offline probe (scripts/probe_uz_offline.py): this model + the full
   search/ring-KV inference stack plays at 21.9 when trained on decisive
   targets -> the stack is sound, the ONLINE loop is the defect.
2. v5 (reference-exact online recipe) telemetry: search visit entropy
   0.53-0.79 (decisive!) with searched_value 0.6-2.5 while real returns
   stay 0.1-0.2 -> the search produces decisive-but-WRONG targets.
3. scripts/diag_uz_hallucination.py on the v5 ckpt: reward head is
   accurate under autoregressive rollout (1% hallucination) but the VALUE
   head inflates monotonically on self-generated obs tokens: 0.165 on the
   real root -> 0.60 mean / 1.27 max after 5 drift steps under RANDOM
   actions. The search backs up exactly those leaf values -> poisoned
   visit targets, the uniform->decisive->wrong policy spiral of v1-v5.

Fix: drift_correction_weight=1.0 (policy/unizero.py) — a second training
forward over the model's OWN 1-step predicted obs embeddings, applying
reward/value/policy CE there. This is MuZero's own medicine (its heads
train on unrolled latents, muzero.py _sample_losses k=1..K); the
teacher-forced-only UniZero loss never corrects values on the tokens the
search actually visits. Regression: tests/test_drift_correction.py.

Optimization scale = what the offline probe demonstrated works for this
model (lr 5e-4, batch 256, ~200 updates/2k steps); collection recipe from
the reference (fixed temperature 0.25, priority off, fixed entropy 5e-3 —
the adaptive alpha's 0.05 floor is a strong uniformizer the probe never
needed).
"""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_uz/breakout_grid_unizero_v6_seed0",
    env=dict(type="breakout_grid", stop_value=30,
             collector_env_num=8, evaluator_env_num=3),
    policy=dict(
        type="unizero",
        model=dict(observation_shape=(10, 10, 4), obs_type="image",
                   action_space_size=3, embed_dim=256, num_layers=2,
                   num_heads=8, max_tokens=20, context_window=8,
                   support_scale=50, num_channels=64, downsample=False),
        num_simulations=50, batch_size=256,
        update_per_collect=None, replay_ratio=0.1,
        train_start_after_envsteps=2000,
        n_episode=8, eval_freq=200, num_unroll_steps=10, td_steps=5,
        learning_rate=5e-4,
        drift_correction_weight=1.0,
        use_adaptive_entropy_weight=False,
        policy_entropy_weight=5e-3,
        use_priority=False,
        manual_temperature_decay=False,
        fixed_temperature_value=0.25,
        predict_latent_loss_type="group_kl",
        auto_resume=True, save_ckpt_freq=2000,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_unizero
    train_unizero(main_config, seed=0, max_env_step=int(1.5e5))
