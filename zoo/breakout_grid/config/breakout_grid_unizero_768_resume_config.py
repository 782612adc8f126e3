"""Continuation of the UniZero-768 breakout_grid run: the round-3 queue
slot capped it at 12.8k env steps (eval best ~1.08), which proved the
768-embed per-node KV search FITS on one chip but not that it learns to
parity with MuZero's 30.3 on this env (VERDICT r3 missing #6).

Warm-starts from the round-3 ckpt_best on first launch; once this run has
written its own resume sidecar, re-launching continues from the periodic
checkpoint with counters intact (trim-safe queue slots)."""
import os

from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_uz/breakout_grid_unizero768_seed0",
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
        auto_resume=True, save_ckpt_freq=1000,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_unizero

    sidecar = os.path.join(main_config["exp_name"], "ckpt", "resume_meta.json")
    warm = (None if os.path.exists(sidecar)  # continue via auto_resume
            else os.path.join(main_config["exp_name"], "ckpt", "ckpt_best"))
    train_unizero(main_config, seed=0, model_path=warm, max_env_step=int(2e5))
