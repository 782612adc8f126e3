"""TicTacToe AlphaZero in SELF-PLAY mode: both collect and eval play both
sides (reference:
zoo/board_games/tictactoe/config/tictactoe_alphazero_sp_mode_config.py —
sp-mode's stop criterion is draw-rate vs itself rather than win-rate vs a
bot)."""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_az/tictactoe_alphazero_sp_seed0",
    env=dict(type="tictactoe", battle_mode="self_play_mode", stop_value=0.7,
             collector_env_num=8, evaluator_env_num=5, n_evaluator_episode=5),
    policy=dict(
        type="alphazero",
        model=dict(observation_shape=(3, 3, 3), action_space_size=9,
                   num_channels=32, num_res_blocks=1),
        num_simulations=25, batch_size=256, update_per_collect=50,
        n_episode=8, eval_freq=200,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_alphazero
    train_alphazero(main_config, seed=0, max_env_step=int(2e5))
