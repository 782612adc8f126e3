"""Grid Breakout UniZero v3 — optimization-scale fix.

Round-4 diagnosis chain for the flat UniZero runs on this env (768 and
256-v2, both pinned at eval ~1 while MuZero solves at 30.3):

1. World model is healthy: per-action reward predictions exact, obs loss
   ~0 (scripts/diag_uz_wm.py, commit 0b402d7).
2. Train path is healthy: the image-path policy head fits a planted
   decisive target, CE 6.59 -> 0.07 in 300 iters
   (scripts/diag_uz_policy_path.py) — so the flatness is NOT a wiring bug.
3. The real contrast with the solved MuZero run is pure optimization
   scale: MuZero trains at lr 3e-3 / batch 256 and its collect-policy
   entropy falls 1.098 -> 0.87 by 40k env steps; UniZero v2 ran at
   lr 1e-4 / batch 64 and entropy moved 1.099 -> 1.087 over 51k steps —
   the same symmetry-breaking loop, ~30x slower, i.e. it never escapes
   the uniform-visits <-> uniform-targets fixed point within the run
   budget. The reference's atari UniZero (lr 1e-4, batch 64) gets away
   with it on real Atari because bricks pay out from step 0 and runs are
   10x longer (zoo/atari/config/atari_unizero_config.py:60-67).

v3 = v2 recipe (fixed entropy weight, group_kl latent loss, manual
temperature decay) with the optimizer scaled to the regime where MuZero
demonstrably escapes: lr 5e-4, batch 256.
"""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_uz/breakout_grid_unizero_v3_seed0",
    env=dict(type="breakout_grid", stop_value=30,
             collector_env_num=8, evaluator_env_num=3),
    policy=dict(
        type="unizero",
        model=dict(observation_shape=(10, 10, 4), obs_type="image",
                   action_space_size=3, embed_dim=256, num_layers=2,
                   num_heads=8, max_tokens=24, support_scale=50,
                   num_channels=64, downsample=False),
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
