"""Pendulum Sampled EfficientZero — the reference's headline continuous-
control config (zoo/classic_control/pendulum/config/
pendulum_cont_sampled_efficientzero_config.py: 50 sims, K=20)."""
from lightzero_tpu.config import Config

K = 20

main_config = Config(dict(
    exp_name=f"data_sez/pendulum_sampled_efficientzero_k{K}_seed0",
    env=dict(env_id="Pendulum-v1", stop_value=-250, collector_env_num=8,
             evaluator_env_num=3, n_evaluator_episode=3),
    policy=dict(
        type="sampled_efficientzero",
        model=dict(observation_shape=3, action_space_size=1,
                   latent_state_dim=128, lstm_hidden_size=128),
        num_simulations=50, num_of_sampled_actions=K, batch_size=256,
        # reference: update_per_collect=None + replay_ratio=0.25 -> ~400
        # updates per 1600-transition collect (4x the old upc=100).
        update_per_collect=None, replay_ratio=0.25, n_episode=8, eval_freq=200,
        ssl_loss_weight=2, optim_type="AdamW", learning_rate=1e-4,
        cos_lr_scheduler=True, lstm_horizon_len=5,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_muzero
    train_muzero(main_config, seed=0, max_env_step=int(1e6))
