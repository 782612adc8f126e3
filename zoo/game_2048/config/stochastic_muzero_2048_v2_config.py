"""2048 Stochastic MuZero v2 — round-4 retune toward the reference recipe
(zoo/game_2048/config/stochastic_muzero_2048_config.py): sims 100 (was
50), manual temperature decay, td_steps 10, discount 0.999, bigger MLP
trunk. The round-2 run (data_stoch/game_2048_stochastic_muzero_seed0)
peaked at eval 2265 @ 86k env steps and then declined — the flat
temperature (no decay) kept late-game collection noisy."""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_stoch/game_2048_smz_v2_seed0",
    env=dict(env_id="game_2048", stop_value=int(1e9), collector_env_num=8,
             evaluator_env_num=3, n_evaluator_episode=3),
    policy=dict(
        type="stochastic_muzero",
        model=dict(observation_shape=4 * 4 * 16, action_space_size=4,
                   chance_space_size=32, latent_state_dim=512, support_scale=300),
        num_simulations=100, batch_size=256, update_per_collect=100, n_episode=8,
        td_steps=10, discount_factor=0.999,
        manual_temperature_decay=True,
        threshold_training_steps_for_final_temperature=int(1e5),
        eval_freq=200, use_ture_chance_label_in_chance_encoder=True,
        auto_resume=True, save_ckpt_freq=3000,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_muzero
    train_muzero(main_config, seed=0, max_env_step=int(1e6))
