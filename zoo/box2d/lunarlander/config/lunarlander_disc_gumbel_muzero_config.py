"""LunarLander discrete Gumbel MuZero (reference:
zoo/box2d/lunarlander/config/lunarlander_disc_gumbel_muzero_config.py)."""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_gmz/lunarlander_disc_gumbel_muzero_seed0",
    env=dict(env_id="LunarLander-v3", stop_value=240, collector_env_num=8,
             evaluator_env_num=3, n_evaluator_episode=3),
    policy=dict(
        type="gumbel_muzero",
        model=dict(observation_shape=8, action_space_size=4, model_type="mlp",
                   latent_state_dim=256),
        num_simulations=50, max_num_considered_actions=4,
        batch_size=256, update_per_collect=200,
        n_episode=8, eval_freq=200, ssl_loss_weight=2,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_muzero
    train_muzero(main_config, seed=0, max_env_step=int(1e6))
