"""LunarLanderContinuous Sampled MuZero (reference:
zoo/box2d/lunarlander/config/lunarlander_cont_sampled_muzero_config.py:
K=20 sampled tanh-Gaussian actions, ns=50)."""
from lightzero_tpu.config import Config

K = 20

main_config = Config(dict(
    exp_name="data_smz/lunarlander_cont_sampled_muzero_seed0",
    env=dict(env_id="LunarLanderContinuous-v3", stop_value=240,
             collector_env_num=8, evaluator_env_num=3, n_evaluator_episode=3),
    policy=dict(
        type="sampled_muzero",
        model=dict(observation_shape=8, action_space_size=2,
                   continuous_action_space=True, latent_state_dim=256),
        num_simulations=50, num_of_sampled_actions=K, batch_size=256,
        update_per_collect=100, n_episode=8, eval_freq=200,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_muzero
    train_muzero(main_config, seed=0, max_env_step=int(1e6))
