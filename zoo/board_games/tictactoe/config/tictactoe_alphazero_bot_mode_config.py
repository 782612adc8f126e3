"""TicTacToe AlphaZero (eval vs rule bot) — reference:
zoo/board_games/tictactoe/config/tictactoe_alphazero_bot_mode_config.py."""
from lightzero_tpu.config import Config

collector_env_num = 8
n_episode = 8
evaluator_env_num = 5
num_simulations = 25
update_per_collect = 50
batch_size = 256
max_env_step = int(2e5)

tictactoe_alphazero_config = Config(
    dict(
        exp_name=f"data_az/tictactoe_alphazero_ns{num_simulations}_upc{update_per_collect}_seed0",
        env=dict(
            type="tictactoe",
            battle_mode="play_with_bot_mode",
            stop_value=0.99,
            collector_env_num=collector_env_num,
            evaluator_env_num=evaluator_env_num,
            n_evaluator_episode=evaluator_env_num,
        ),
        policy=dict(
            model=dict(
                observation_shape=(3, 3, 3),
                action_space_size=9,
                num_channels=32,
                num_res_blocks=1,
            ),
            num_simulations=num_simulations,
            batch_size=batch_size,
            update_per_collect=update_per_collect,
            n_episode=n_episode,
            eval_freq=100,
            optim_type="Adam",
            learning_rate=0.003,
            manual_temperature_decay=True,
            threshold_training_steps_for_final_temperature=int(5e3),
        ),
    )
)
main_config = tictactoe_alphazero_config

if __name__ == "__main__":
    from lightzero_tpu.entry.train_alphazero import train_alphazero

    train_alphazero(main_config, seed=0, max_env_step=max_env_step)
