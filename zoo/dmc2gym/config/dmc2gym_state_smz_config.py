"""DeepMind Control (state obs) Sampled MuZero (reference
zoo/dmc2gym/config/dmc2gym_state_smz_config.py). GATED: requires
dm_control (absent — config compiles, run raises)."""
from lightzero_tpu.config import Config

domain, task = "cartpole", "swingup"

main_config = Config(dict(
    exp_name=f"data_smz/dmc2gym_{domain}_{task}_state_smz_seed0",
    env=dict(env_id="dmc2gym", stop_value=int(1e6), collector_env_num=8,
             evaluator_env_num=3,
             env_kwargs=dict(domain_name=domain, task_name=task, from_pixels=False)),
    policy=dict(
        type="sampled_muzero",
        model=dict(observation_shape=5, action_space_size=1,
                   continuous_action_space=True, latent_state_dim=256),
        num_simulations=50, num_of_sampled_actions=20, batch_size=256,
        update_per_collect=200, n_episode=8, eval_freq=1000,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_muzero
    train_muzero(main_config, seed=0, max_env_step=int(1e6))
