"""2048 plain-MuZero v2 — the deterministic half of the round-5 ablation
pair (reference README.md:304-308: stochastic MuZero > plain MuZero on
2048 because tile spawns are unmodeled noise for a deterministic model).

Hyperparameters mirror stochastic_muzero_2048_v2_config.py EXACTLY except
the policy type and the chance-encoder fields, so the eval gap isolates
the stochastic dynamics modeling itself: sims 100, bs 256, upc 100,
td_steps 10, discount 0.999, latent 512, manual temperature decay.
"""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_mz/game_2048_mz_v2_seed0",
    env=dict(env_id="game_2048", stop_value=int(1e9), collector_env_num=8,
             evaluator_env_num=3, n_evaluator_episode=3),
    policy=dict(
        type="muzero",
        model=dict(observation_shape=4 * 4 * 16, action_space_size=4,
                   latent_state_dim=512, support_scale=300),
        num_simulations=100, batch_size=256, update_per_collect=100, n_episode=8,
        td_steps=10, discount_factor=0.999,
        manual_temperature_decay=True,
        threshold_training_steps_for_final_temperature=int(1e5),
        eval_freq=200,
        auto_resume=True, save_ckpt_freq=3000,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_muzero
    train_muzero(main_config, seed=0, max_env_step=int(1e6))
