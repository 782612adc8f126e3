"""LunarLander discrete + DISCRETE Sampled MuZero (reference discrete
sampled branch, lzero/policy/sampled_muzero.py:694 — K=4 of 4 actions
sampled without replacement, CE policy loss over the sampled set)."""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_smz/lunarlander_disc_sampled_muzero_seed0",
    env=dict(type="lunarlander", stop_value=200, collector_env_num=8,
             evaluator_env_num=3, n_evaluator_episode=3),
    policy=dict(
        type="sampled_muzero",
        model=dict(observation_shape=8, action_space_size=4,
                   continuous_action_space=False, model_type="mlp",
                   latent_state_dim=256),
        num_of_sampled_actions=4,
        num_simulations=50, batch_size=256, update_per_collect=200,
        n_episode=8, eval_freq=500,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_muzero
    main_config.policy.model.support_scale = 300
    train_muzero(main_config, seed=0, max_env_step=int(5e5))
