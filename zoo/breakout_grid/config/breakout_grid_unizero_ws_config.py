"""Grid Breakout UniZero — warm-start online continuation.

The round-5 cold-start lineage (v5-v9) fixed three measured defects
(value drift -> drift_correction; encoder collapse -> recon anchor;
winner's-curse optimism -> depth-2 correction + ns 25, giving a CALIBRATED
search: searched_value 0.18 vs true ~0.15) yet from-scratch online
learning still pins at eval ~0.1: the cold-start policy-improvement loop
that MuZero's unrolled-latent training escapes in 5-15k steps does not
ignite for the teacher-forced transformer WM within this env's budget.

This run answers the remaining question: does the ONLINE loop work at all
once out of the degenerate cold-start basin? It warm-starts from the
offline-distillation probe's exported params (scripts/probe_uz_offline.py
-> data_uz/probe_params_best, search_eval 21.9) and continues with the
full online loop (self-play collection + search targets + TD values).

  - online eval sustains/improves toward 30 -> the online loop is sound;
    the from-scratch gap is exploration ignition only;
  - online eval collapses -> the loop still poisons a good policy.

Arch must match the probe export exactly (no decoder -> recon off; the
warm encoder is already informative and targets are decisive from step 0,
so collapse pressure is low). Collection at the reference's
post-convergence temperature 0.25.
"""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_uz/breakout_grid_unizero_ws_seed0",
    env=dict(type="breakout_grid", stop_value=30,
             collector_env_num=8, evaluator_env_num=3),
    policy=dict(
        type="unizero",
        model=dict(observation_shape=(10, 10, 4), obs_type="image",
                   action_space_size=3, embed_dim=256, num_layers=2,
                   num_heads=8, max_tokens=24, context_window=0,
                   support_scale=50, num_channels=64, downsample=False),
        num_simulations=25, batch_size=256,
        update_per_collect=None, replay_ratio=0.1,
        train_start_after_envsteps=2000,
        n_episode=8, eval_freq=200, num_unroll_steps=10, td_steps=5,
        learning_rate=5e-4,
        drift_correction_weight=1.0,
        drift_correction_depth=2,
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
    train_unizero(main_config, seed=0,
                  model_path="data_uz/probe_params_best",
                  max_env_step=int(1e5))
