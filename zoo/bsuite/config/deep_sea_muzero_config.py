"""Deep Sea (bsuite hard-exploration probe) MuZero (reference:
zoo/bsuite/config/bsuite_muzero_config.py; env rebuilt pure-JAX in
lightzero_tpu/envs/bsuite_like.py)."""
from lightzero_tpu.config import Config

SIZE = 10

main_config = Config(dict(
    exp_name=f"data_bsuite/deep_sea{SIZE}_muzero_seed0",
    env=dict(type="deep_sea", size=SIZE, stop_value=0.99,
             collector_env_num=8, evaluator_env_num=3, n_evaluator_episode=3),
    policy=dict(
        type="muzero",
        model=dict(observation_shape=SIZE * SIZE, action_space_size=2,
                   model_type="mlp", latent_state_dim=128, support_scale=25,
                   self_supervised_learning_loss=True),
        ssl_loss_weight=2.0, num_simulations=25, batch_size=256,
        update_per_collect=100, n_episode=8, eval_freq=200,
        # exploration probe: keep root Dirichlet noise strong
        root_noise_weight=0.25, td_steps=5,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_muzero
    train_muzero(main_config, seed=0, max_env_step=int(2e5))
