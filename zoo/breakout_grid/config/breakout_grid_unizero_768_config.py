"""Grid Breakout UniZero at REFERENCE Atari scale (embed_dim 768, 2
layers, context 10 steps, 50 sims — reference
zoo/atari/config/atari_unizero_config.py:60-67): proves the per-node
KV-cache search design at the size the reference ships.

HBM budget of the per-node KV embedding (policy/unizero.py): cache =
2 (K,V) × num_layers × max_tokens × embed_dim floats/env ≈ 2·2·24·768·4B
≈ 295 KB; the search tree holds num_simulations+1 = 51 node embeddings ×
batch 64 ≈ 0.96 GB — fits single-chip HBM with ample headroom."""
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
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_unizero
    train_unizero(main_config, seed=0, max_env_step=int(2e5))
