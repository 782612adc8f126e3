"""CartPole + DISCRETE Sampled EfficientZero (reference:
zoo/classic_control/cartpole/config/cartpole_sampled_efficientzero_config.py:
continuous_action_space=False, K=2, ns=25, upc=100, batch=256)."""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_sez/cartpole_sampled_efficientzero_disc_seed0",
    env=dict(type="cartpole", stop_value=195, collector_env_num=8,
             evaluator_env_num=3, n_evaluator_episode=3),
    policy=dict(
        type="sampled_efficientzero",
        model=dict(observation_shape=4, action_space_size=2,
                   continuous_action_space=False, model_type="mlp",
                   latent_state_dim=128, lstm_hidden_size=128),
        num_of_sampled_actions=2,
        num_simulations=25, batch_size=256, update_per_collect=100,
        n_episode=8, eval_freq=200,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_muzero
    train_muzero(main_config, seed=0, max_env_step=int(1e5))
