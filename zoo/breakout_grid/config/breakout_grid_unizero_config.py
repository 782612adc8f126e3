"""Grid Breakout UniZero (image world model, conv tokenizer + decoder)."""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_uz/breakout_grid_unizero_seed0",
    env=dict(type="breakout_grid", stop_value=30,
             collector_env_num=8, evaluator_env_num=3),
    policy=dict(
        type="unizero",
        model=dict(observation_shape=(10, 10, 4), obs_type="image",
                   action_space_size=3, embed_dim=128, num_layers=2,
                   num_heads=8, max_tokens=20, support_scale=50,
                   num_channels=32, downsample=False),
        latent_recon_loss_weight=0.05,
        num_simulations=25, batch_size=64, update_per_collect=100,
        n_episode=8, eval_freq=200, num_unroll_steps=10, td_steps=5,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_unizero
    train_unizero(main_config, seed=0, max_env_step=int(5e5))
