"""DeepMind Control (state obs) Sampled UniZero (reference
zoo/dmc2gym/config/dmc2gym_state_suz_config.py). GATED: requires
dm_control."""
from lightzero_tpu.config import Config

domain, task = "cartpole", "swingup"

main_config = Config(dict(
    exp_name=f"data_suz/dmc2gym_{domain}_{task}_state_suz_seed0",
    env=dict(env_id="dmc2gym", stop_value=int(1e6), collector_env_num=8,
             evaluator_env_num=3,
             env_kwargs=dict(domain_name=domain, task_name=task, from_pixels=False)),
    policy=dict(
        type="sampled_unizero",
        model=dict(observation_shape=5, action_space_size=1,
                   continuous_action_space=True, embed_dim=128,
                   num_layers=2, num_heads=4, max_tokens=16,
                   support_scale=100),
        num_simulations=50, num_of_sampled_actions=20, batch_size=64,
        update_per_collect=60, n_episode=8, eval_freq=1000,
        learning_rate=0.001,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_unizero
    train_unizero(main_config, seed=0, max_env_step=int(1e6))
