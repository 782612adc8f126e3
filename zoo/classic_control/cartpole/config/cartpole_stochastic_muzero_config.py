"""CartPole Stochastic MuZero (reference:
zoo/classic_control/cartpole/config/cartpole_stochastic_muzero_config.py —
deterministic env as the stochastic-pipeline control: chance nodes should
learn a degenerate outcome distribution)."""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_stoch/cartpole_stochastic_muzero_seed0",
    env=dict(env_id="CartPole-v0", stop_value=195, collector_env_num=8,
             evaluator_env_num=3, n_evaluator_episode=3),
    policy=dict(
        type="stochastic_muzero",
        model=dict(observation_shape=4, action_space_size=2, model_type="mlp",
                   chance_space_size=2, latent_state_dim=128),
        num_simulations=25, batch_size=256, update_per_collect=100,
        n_episode=8, eval_freq=100, ssl_loss_weight=2,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_muzero
    train_muzero(main_config, seed=0, max_env_step=int(1e5))
