"""BipedalWalker Sampled EfficientZero (reference:
zoo/box2d/bipedalwalker/config/bipedalwalker_cont_sampled_efficientzero_config.py:
K=20, ns=50, 4-dim continuous action)."""
from lightzero_tpu.config import Config

K = 20

main_config = Config(dict(
    exp_name="data_sez/bipedalwalker_cont_sez_seed0",
    env=dict(env_id="BipedalWalker-v3", stop_value=300,
             collector_env_num=8, evaluator_env_num=3, n_evaluator_episode=3),
    policy=dict(
        type="sampled_efficientzero",
        model=dict(observation_shape=24, action_space_size=4,
                   continuous_action_space=True, latent_state_dim=256),
        num_simulations=50, num_of_sampled_actions=K, batch_size=256,
        update_per_collect=100, n_episode=8, eval_freq=200,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_muzero
    train_muzero(main_config, seed=0, max_env_step=int(1e6))
