"""Atari UniZero (reference: zoo/atari/config/atari_unizero_config.py —
transformer world model, embed_dim 768, 2 layers). Requires ale_py."""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_uz/pong_unizero_seed0",
    env=dict(env_id="ALE/Pong-v5", stop_value=20, collector_env_num=8,
             evaluator_env_num=3, n_evaluator_episode=3),
    policy=dict(
        type="unizero",
        model=dict(
            observation_shape=(96, 96, 3),
            obs_type="image",
            action_space_size=6,
            embed_dim=768,
            num_layers=2,
            num_heads=8,
            max_tokens=20,  # 2 * infer context of 10 steps
            num_channels=64,
        ),
        num_simulations=50,
        num_unroll_steps=10,
        batch_size=64,
        replay_ratio=0.25,
        n_episode=8,
        eval_freq=int(2e3),
        learning_rate=1e-4,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.envs.atari import is_available
    assert is_available(), "ale_py is not installed in this image"
    from lightzero_tpu.entry import train_unizero
    train_unizero(main_config, seed=0, max_env_step=int(5e5))
