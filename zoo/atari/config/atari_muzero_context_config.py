"""Atari MuZero-Context: root latent built recursively from the last
context_length_init observations (reference:
zoo/atari/config/atari_muzero_context_config.py; policy
lzero/policy/muzero.py context variant).

Requires ale_py (gated)."""
from lightzero_tpu.config import Config

env_id = "ALE/Pong-v5"

main_config = Config(dict(
    exp_name="data_mz/pong_muzero_context_seed0",
    env=dict(env_id=env_id, stop_value=20, collector_env_num=8,
             evaluator_env_num=3, n_evaluator_episode=3),
    policy=dict(
        type="muzero_context",
        model=dict(observation_shape=(96, 96, 12), action_space_size=6,
                   model_type="conv", num_channels=64, num_res_blocks=1,
                   downsample=True, self_supervised_learning_loss=True),
        frame_stack_num=4, context_length_init=4,
        num_simulations=50, batch_size=256, replay_ratio=0.25, n_episode=8,
        eval_freq=int(2e3), ssl_loss_weight=2,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_muzero
    train_muzero(main_config, seed=0, max_env_step=int(5e5))
