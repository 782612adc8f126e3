"""TicTacToe MuZero v2 — bot-mode top-up (round-4 verdict weak #5: the
benchmark row passes at exactly its 0.8 threshold while the reference
masters tictactoe; the round-2 run peaked at 0.8 and decayed with no
surviving checkpoint).

Recipe = the connect4 bot-mode recipe that reached 0.86+ there
(reference zoo/board_games/tictactoe/config/tictactoe_muzero_bot_mode_
config.py axes): fixed collect temperature 0.25, ns 50, lr 3e-3,
grad_clip 0.5, td spanning the whole game, plus auto_resume + durable
params_best exports so the result is re-evaluable.
"""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_mz/tictactoe_muzero_v2_seed0",
    env=dict(type="tictactoe", battle_mode="play_with_bot_mode", stop_value=0.99,
             collector_env_num=8, evaluator_env_num=5, n_evaluator_episode=10),
    policy=dict(
        type="muzero", env_type="board_games",
        model=dict(observation_shape=(3, 3, 3), action_space_size=9,
                   model_type="conv", num_channels=32, num_res_blocks=1,
                   downsample=False, support_scale=10),
        td_steps=9, num_unroll_steps=3, discount_factor=1.0,
        num_simulations=50, batch_size=256, update_per_collect=50,
        n_episode=8, eval_freq=2000, learning_rate=0.003, grad_clip_value=0.5,
        fixed_temperature_value=0.25,
        auto_resume=True, save_ckpt_freq=3000,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_muzero
    train_muzero(main_config, seed=0, max_env_step=int(2e5))
