"""Grid Breakout UniZero-768 v2 — the reference-scale run (embed 768,
2 layers, 50 sims: zoo/atari/config/atari_unizero_config.py:60-67) with
the recipe fixes validated at embed 256 (breakout_grid_unizero_v2_config):

1. fixed policy-entropy weight 5e-3 instead of adaptive alpha (the v1
   run's alpha anneal horizon was 7x the run length, pinning the policy
   at uniform — its logged entropy never left [0.93, 1.05], uniform =
   1.099, while alpha climbed to 2.18);
2. group_kl next-latent loss over SimNorm groups (MSE is second-order in
   the small per-group shifts that carry action information);
3. manual collect-temperature decay to 0.25 (as MuZero's solved run on
   this env).

v1 plateau to beat: eval ~1.3 @ 71k env steps
(data_uz/breakout_grid_unizero768_seed0); MuZero on the same env: 30.3.
"""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_uz/breakout_grid_unizero768_v2_seed0",
    env=dict(type="breakout_grid", stop_value=30,
             collector_env_num=8, evaluator_env_num=3),
    policy=dict(
        type="unizero",
        model=dict(observation_shape=(10, 10, 4), obs_type="image",
                   action_space_size=3, embed_dim=768, num_layers=2,
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
    train_unizero(main_config, seed=0, max_env_step=int(2e5))
