"""Grid Breakout UniZero v9 — deep drift correction + narrower search.

v8 (all prior fixes + temperature-decay exploration) still pinned at eval
~0.1 with visit entropy 0.24 and searched_value 5-10x the true value: the
search adversarially SELECTS the most value-inflated branches (winner's
curse over WM noise) at depths the depth-1 drift correction never trains.
v9: drift_correction_depth=2 (pass-2 substitutes pass-1's predictions ->
heads train on depth-2 drift states) and num_simulations 50->25 (less
adversarial max-selection while the WM is young; the solved MuZero run
used 25).

Prior fix lineage (v6: value drift correction; v7: reconstruction anchor
against encoder collapse; v8: exploration schedule):

v7 fixed both model-side defects (value drift correction + reconstruction
anchor against encoder collapse — see its docstring for the measured
chain) and its search became decisive (visit entropy 0.24-0.39) with a
calibrated value scale, but collection at fixed temperature 0.25 from
step 0 kept feeding the buffer the same mediocre trajectories (collect
return pinned 0.1-0.4 at 17k+ steps). The MuZero run that SOLVES this env
(data_mz/breakout_grid_muzero_seed0, eval 30.3) explores at temperature
1.0 with manual decay at 50k train iters; the reference's fixed-0.25
default is tuned for Atari where random play already scores. v8 keeps
every v7 fix and restores the proven exploration schedule.
"""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_uz/breakout_grid_unizero_v9_seed0",
    env=dict(type="breakout_grid", stop_value=30,
             collector_env_num=8, evaluator_env_num=3),
    policy=dict(
        type="unizero",
        model=dict(observation_shape=(10, 10, 4), obs_type="image",
                   action_space_size=3, embed_dim=256, num_layers=2,
                   num_heads=8, max_tokens=20, context_window=8,
                   support_scale=50, num_channels=64, downsample=False),
        num_simulations=25, batch_size=256,
        update_per_collect=None, replay_ratio=0.1,
        train_start_after_envsteps=2000,
        n_episode=8, eval_freq=200, num_unroll_steps=10, td_steps=5,
        learning_rate=5e-4,
        drift_correction_weight=1.0,
        drift_correction_depth=2,
        latent_recon_loss_weight=0.5,
        use_adaptive_entropy_weight=False,
        policy_entropy_weight=5e-3,
        use_priority=False,
        manual_temperature_decay=True,
        threshold_training_steps_for_final_temperature=int(2.5e4),
        predict_latent_loss_type="group_kl",
        auto_resume=True, save_ckpt_freq=2000,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_unizero
    train_unizero(main_config, seed=0, max_env_step=int(1.5e5))
