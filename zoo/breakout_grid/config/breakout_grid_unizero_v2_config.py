"""Grid Breakout UniZero v2 (embed 256) — recipe-validation run for the
flat uz768 result (data_uz/breakout_grid_unizero768_seed0: eval ~1.3 over
71k env steps vs MuZero's 30.3 on the same env).

Root-cause analysis of the flat run's learner logs:

1. ENTROPY PINNING. policy_entropy sat at 0.93-1.05 (uniform = log 3 =
   1.099) for the entire run while entropy_weight (the learned alpha)
   climbed to 2.18 — the adaptive-entropy target decays over
   target_entropy_decay_steps=1e5 TRAIN ITERS, but the run only reached
   ~14k iters, so the target entropy never fell below 0.93·log(A) and
   alpha actively pushed the policy back to uniform all run. The
   reference anneals over 5e5 iters BUT its atari runs take ~1e5+ iters
   (unizero.py:264-266); ours are 10-30x shorter. The solved pendulum
   suz-v2 recipe disabled adaptive entropy outright — do the same here
   with the reference MuZero-style fixed weight.
2. SimNorm latents trained with MSE next-latent loss — the pairing
   root-caused in the sampled-unizero retune (small per-group probability
   shifts carrying action information are first-order in KL, second-order
   in MSE). Use group_kl.
3. No collect temperature decay (MuZero's solved run on this env uses
   manual decay to 0.25).

Reference scale anchor: zoo/atari/config/atari_unizero_config.py:60-67.
"""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_uz/breakout_grid_unizero_v2_seed0",
    env=dict(type="breakout_grid", stop_value=30,
             collector_env_num=8, evaluator_env_num=3),
    policy=dict(
        type="unizero",
        model=dict(observation_shape=(10, 10, 4), obs_type="image",
                   action_space_size=3, embed_dim=256, num_layers=2,
                   num_heads=8, max_tokens=24, support_scale=50,
                   num_channels=64, downsample=False),
        num_simulations=50, batch_size=64, update_per_collect=100,
        n_episode=8, eval_freq=200, num_unroll_steps=10, td_steps=5,
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
