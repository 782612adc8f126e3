"""Atari UniZero with sparse-MoE world-model feed-forward + ViT encoder
option (reference: atari_unizero_config.py + moe.py/vit.py flags)."""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_uz/atari_pong_unizero_moe_seed0",
    env=dict(type="atari", env_id="PongNoFrameskip-v4", stop_value=20,
             collector_env_num=8, evaluator_env_num=3),
    policy=dict(
        type="unizero",
        model=dict(observation_shape=(64, 64, 3), obs_type="image",
                   action_space_size=6, embed_dim=256, num_layers=2,
                   num_heads=8, max_tokens=20, support_scale=300,
                   moe_in_transformer=True, num_experts=4,
                   num_experts_per_tok=1, encoder_type="conv"),
        num_simulations=50, batch_size=64, update_per_collect=200,
        n_episode=8, eval_freq=500, num_unroll_steps=10, td_steps=5,
        latent_recon_loss_weight=0.1,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_unizero
    train_unizero(main_config, seed=0, max_env_step=int(1e6))
