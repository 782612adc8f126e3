"""2048 with PLAIN MuZero — the deterministic-model half of the reference's
MuZero-vs-StochasticMuZero 2048 ablation (reference
zoo/game_2048/config/muzero_2048_config.py: ns=100, upc=200, bs=512;
stochastic tile spawns are NOT modeled, so this should plateau below the
stochastic variant — that gap IS the result)."""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_mz/game_2048_muzero_seed0",
    env=dict(type="game_2048", stop_value=int(1e9), collector_env_num=8,
             evaluator_env_num=3, n_evaluator_episode=3),
    policy=dict(
        type="muzero",
        model=dict(observation_shape=4 * 4 * 16, action_space_size=4,
                   model_type="mlp", latent_state_dim=256,
                   support_scale=300),
        num_simulations=100, batch_size=512, update_per_collect=200,
        n_episode=8, eval_freq=500, ssl_loss_weight=2,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_muzero
    train_muzero(main_config, seed=0, max_env_step=int(1e6))
