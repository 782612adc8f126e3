"""Connect4 MuZero vs rule bot — continuation of the 381k-step run
(data_mz/connect4_muzero_ns50_seed0 hit its queue wall-clock cap before
the reference's 500k-step budget,
zoo/board_games/connect4/config/connect4_muzero_bot_mode_config.py:14).
Warm-starts params from iteration_30000 and trains the remaining budget
with a fresh replay buffer (all fresh games come from the strong policy,
so this also acts as a full-buffer reanalyze)."""
import os

from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_mz/connect4_muzero_ns50_seed0_cont",
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
        auto_resume=True, save_ckpt_freq=3000,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_muzero
    sidecar = os.path.join(main_config["exp_name"], "ckpt", "resume_meta.json")
    ckpt = (None if os.path.exists(sidecar)  # continue via auto_resume
            else "data_mz/connect4_muzero_ns50_seed0/ckpt/iteration_30000")
    train_muzero(main_config, seed=1, model_path=ckpt, max_env_step=int(32e4))
