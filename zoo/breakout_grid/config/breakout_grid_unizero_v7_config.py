"""Grid Breakout UniZero v7 — drift correction + reconstruction anchor.

Round-5 diagnosis, final layer: v6 (drift_correction_weight=1.0) fixed
the value hallucination on self-generated tokens (diag on the v6 ckpt:
drifted-token values flat 0.148-0.157 vs v5's 0.236->0.595 inflation),
but v6's encoder COLLAPSED outright: all distinct observations map to the
IDENTICAL 256-d embedding (measured pairwise distance 0.0, per-dim std
0.0, norm sqrt(32) = every SimNorm group at a one-hot corner; obs_loss
1e-4). Mechanics: early online targets are near-uniform (policy) and
near-constant (value), so the only strong gradient is the weight-10
next-latent prediction loss — which a CONSTANT encoder minimizes
trivially. The offline probe never collapsed because its expert targets
are state-dependent from step 0.

The reference anchors its image tokenizer with a decoder reconstruction
loss (+LPIPS) so the encoder cannot collapse (tokenizer.py:283-301). We
implemented that path (latent_recon_loss_weight, decode_obs,
policy/unizero.py) but defaulted it 0 in every breakout run. v7 turns it
on: latent_recon_loss_weight=0.5 (MSE on the (10,10,4) obs planes;
LPIPS off — VGG weights absent in this image).

Also logs learner/latent_batch_std (new collapse telemetry) — watch it:
healthy > 0.05, collapse -> 0.
"""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_uz/breakout_grid_unizero_v7_seed0",
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
        latent_recon_loss_weight=0.5,
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
