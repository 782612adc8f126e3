"""Gomoku Sampled AlphaZero vs rule bot (reference:
zoo/board_games/gomoku/config/gomoku_sampled_alphazero_bot_mode_config.py:
root legal-action subsampling bounds the branching factor on big boards)."""
from lightzero_tpu.config import Config

board_size = 6

main_config = Config(dict(
    exp_name=f"data_az/gomoku{board_size}_sampled_alphazero_seed0",
    env=dict(type="gomoku", battle_mode="play_with_bot_mode", stop_value=0.99,
             env_kwargs=dict(board_size=board_size, n_in_row=4),
             collector_env_num=8, evaluator_env_num=5, n_evaluator_episode=5),
    policy=dict(
        type="sampled_alphazero",
        model=dict(observation_shape=(board_size, board_size, 3),
                   action_space_size=board_size * board_size,
                   num_channels=32, num_res_blocks=1),
        num_of_sampled_actions=18,
        num_simulations=50, batch_size=256, update_per_collect=50,
        n_episode=8, eval_freq=200,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_alphazero
    train_alphazero(main_config, seed=0, max_env_step=int(5e5))
