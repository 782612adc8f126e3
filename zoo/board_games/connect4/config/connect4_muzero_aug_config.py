"""Connect4 MuZero vs rule bot with column-mirror replay augmentation.

From-scratch rerun of the bot-mode recipe (reference
zoo/board_games/connect4/config/connect4_muzero_bot_mode_config.py): the
sandbox restart wiped every full checkpoint of the 381k-step run (best
harness win-rate 0.857) and its warm continuation (peak eval 0.93 @ 102k,
ckpt_best re-eval 0.824/57ep), so no warm start exists. This run adds the
lever that took TicTacToe/Gomoku AlphaZero to 1.00 — symmetry
augmentation — to the MuZero unroll path: each replay sample is
left-right mirrored with prob 0.5 (obs W axis + column actions + policy
targets together; GameBuffer.mirror_augmentation). Weights are durable
via params_best exports, and auto_resume lets later rounds continue.
"""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_mz/connect4_muzero_aug_seed0",
    env=dict(type="connect4", battle_mode="play_with_bot_mode", stop_value=0.99,
             collector_env_num=8, evaluator_env_num=5),
    policy=dict(
        type="muzero", env_type="board_games",
        model=dict(observation_shape=(6, 7, 3), action_space_size=7,
                   model_type="conv", num_channels=64, num_res_blocks=1,
                   downsample=False,
                   support_scale=10),
        td_steps=21, discount_factor=1.0, num_simulations=50, batch_size=256,
        update_per_collect=50, n_episode=8, eval_freq=2000,
        learning_rate=0.003, grad_clip_value=0.5,
        mirror_augmentation=True,
        auto_resume=True, save_ckpt_freq=3000,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_muzero
    train_muzero(main_config, seed=0, max_env_step=int(5e5))
