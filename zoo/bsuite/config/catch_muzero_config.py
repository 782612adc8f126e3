"""Catch (bsuite credit-assignment probe) MuZero (reference:
zoo/bsuite/config/bsuite_muzero_config.py; env rebuilt pure-JAX in
lightzero_tpu/envs/bsuite_like.py)."""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_bsuite/catch_muzero_seed0",
    env=dict(type="catch", rows=10, cols=5, stop_value=0.95,
             collector_env_num=8, evaluator_env_num=3, n_evaluator_episode=3),
    policy=dict(
        type="muzero",
        model=dict(observation_shape=50, action_space_size=3,
                   model_type="mlp", latent_state_dim=64, support_scale=25),
        num_simulations=25, batch_size=256, update_per_collect=50,
        n_episode=8, eval_freq=200, td_steps=5,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_muzero
    train_muzero(main_config, seed=0, max_env_step=int(5e4))
