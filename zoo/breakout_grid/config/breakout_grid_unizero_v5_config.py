"""Grid Breakout UniZero v5 — reference-exact ONLINE recipe.

Round-5 localization: the offline-distillation probe
(scripts/probe_uz_offline.py, data_uz/probe_offline.json) trained this
exact model offline on scripted-expert data and evaluated it ONLINE
through the full search + rolling ring-KV paths: search_eval 21.9 after
1000 train steps (vs 0.17 for the online v3 run). The inference stack is
therefore sound; what fails is the online LOOP. v1-v3 diverged from the
reference's online UniZero recipe (lzero/policy/unizero.py defaults +
zoo/atari/config/atari_unizero_config.py) on exactly the knobs that shape
early escape dynamics, all fixed here:

  - fixed_temperature_value=0.25 from step 0 (v1-v3 collected at T=1.0
    with manual decay — reference unizero.py:451-456 uses NO decay and
    T=0.25: sharp exploitation of visit asymmetries, exploration via
    root Dirichlet noise only);
  - use_priority=False (unizero.py:464; priority IS over near-random
    early data skews sampling toward value-error outliers);
  - update_per_collect=None + replay_ratio=0.25 (unizero.py:397-400):
    ~500 updates per 2000-step collect vs v3's fixed 100 — 5x more
    optimization per datum, the real version of v3's "optimization
    scale" diagnosis;
  - train_start_after_envsteps=2000 (atari_unizero_config.py:79);
  - lr 1e-4 AdamW, batch 64, adaptive entropy alpha (reference defaults);
  - max_tokens=20 = 2*num_unroll_steps, context_window=8 =
    2*infer_context_length (atari_unizero_config.py:60-61).
"""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_uz/breakout_grid_unizero_v5_seed0",
    env=dict(type="breakout_grid", stop_value=30,
             collector_env_num=8, evaluator_env_num=3),
    policy=dict(
        type="unizero",
        model=dict(observation_shape=(10, 10, 4), obs_type="image",
                   action_space_size=3, embed_dim=256, num_layers=2,
                   num_heads=8, max_tokens=20, context_window=8,
                   support_scale=50, num_channels=64, downsample=False),
        num_simulations=50, batch_size=64,
        update_per_collect=None, replay_ratio=0.25,
        train_start_after_envsteps=2000,
        n_episode=8, eval_freq=200, num_unroll_steps=10, td_steps=5,
        learning_rate=1e-4,
        use_adaptive_entropy_weight=True,
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
