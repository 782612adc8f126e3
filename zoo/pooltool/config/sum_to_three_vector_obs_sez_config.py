"""Pooltool sum-to-three Sampled EfficientZero (reference
zoo/pooltool/sum_to_three/config/sum_to_three_vector_obs_sez_config.py:
4-dim ball-coordinate obs, 2-dim continuous strike action). GATED:
requires pooltool (absent — config compiles, run raises)."""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_sez/sum_to_three_vector_sez_seed0",
    env=dict(env_id="sum_to_three", stop_value=int(1e6), collector_env_num=8,
             evaluator_env_num=3, env_kwargs=dict(episode_length=10)),
    policy=dict(
        type="sampled_efficientzero",
        model=dict(observation_shape=4, action_space_size=2,
                   continuous_action_space=True, latent_state_dim=128,
                   lstm_hidden_size=128),
        num_simulations=50, num_of_sampled_actions=20, batch_size=256,
        update_per_collect=100, n_episode=8, eval_freq=1000, discount_factor=1.0,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_muzero
    train_muzero(main_config, seed=0, max_env_step=int(1e6))
