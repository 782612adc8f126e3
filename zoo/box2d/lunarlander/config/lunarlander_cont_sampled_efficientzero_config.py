"""LunarLanderContinuous Sampled EfficientZero via the gymnasium host-env
path (reference: zoo/box2d/lunarlander/config/
lunarlander_cont_sampled_efficientzero_config.py; K=20 sampled actions)."""
from lightzero_tpu.config import Config

K = 20

main_config = Config(dict(
    exp_name=f"data_sez/lunarlander_cont_sez_k{K}_seed0",
    env=dict(env_id="LunarLanderContinuous-v3", stop_value=240,
             collector_env_num=8, evaluator_env_num=3, n_evaluator_episode=3),
    policy=dict(
        type="sampled_efficientzero",
        model=dict(observation_shape=8, action_space_size=2,
                   latent_state_dim=256, lstm_hidden_size=256),
        num_simulations=50, num_of_sampled_actions=K, batch_size=256,
        update_per_collect=200, n_episode=8, eval_freq=500,
        ssl_loss_weight=2, optim_type="AdamW", learning_rate=1e-4,
        cos_lr_scheduler=True, lstm_horizon_len=5,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_muzero
    train_muzero(main_config, seed=0, max_env_step=int(2e6))
