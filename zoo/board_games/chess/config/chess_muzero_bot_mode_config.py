"""Chess MuZero vs rule bot: learned dynamics over the 8x8x20 board planes
with the 4672-action space (no reference counterpart config — the reference
ships chess only for AlphaZero; MuZero works here because the env is a
JaxEnv usable by the fused collector)."""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_mz/chess_muzero_ns50_seed0",
    env=dict(type="chess", battle_mode="play_with_bot_mode", stop_value=0.95,
             collector_env_num=8, evaluator_env_num=5, n_evaluator_episode=10),
    policy=dict(
        type="muzero",
        model=dict(observation_shape=(8, 8, 20), action_space_size=4672,
                   model_type="conv", downsample=False, num_channels=96, num_res_blocks=6,
                   support_scale=25),
        num_simulations=50, batch_size=256, update_per_collect=100, n_episode=8,
        eval_freq=500, td_steps=5, num_unroll_steps=5,
        manual_temperature_decay=True,
        threshold_training_steps_for_final_temperature=int(1e5),
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_muzero
    train_muzero(main_config, seed=0, max_env_step=int(5e6))
