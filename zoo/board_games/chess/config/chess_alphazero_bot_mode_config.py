"""Chess AlphaZero vs material-greedy rule bot (reference:
zoo/board_games/chess/config/chess_alphazero_bot_mode_config.py; the
pure-JAX chess env implements the full rule set with the 4672-action
AlphaZero move encoding, so the env-as-simulator search runs on device)."""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_az/chess_alphazero_ns50_seed0",
    env=dict(type="chess", battle_mode="play_with_bot_mode", stop_value=0.95,
             collector_env_num=8, evaluator_env_num=5, n_evaluator_episode=10),
    policy=dict(
        model=dict(observation_shape=(8, 8, 20), action_space_size=4672,
                   num_channels=96, num_res_blocks=6),
        num_simulations=50, batch_size=256, update_per_collect=100, n_episode=8,
        eval_freq=500, manual_temperature_decay=True,
        threshold_training_steps_for_final_temperature=int(1e5),
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_alphazero
    train_alphazero(main_config, seed=0, max_env_step=int(5e6))
