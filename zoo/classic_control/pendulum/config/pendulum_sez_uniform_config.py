"""Pendulum Sampled-EfficientZero (K=20) — post-root-cause run.

Identical recipe to pendulum_sampled_efficientzero_config.py but in a
fresh exp dir so the honest benchmark row comes from a run with the
round-4 uniform-pUCT-prior fix active (the pre-fix run's "solved" spike
was retracted as a 2-episode eval fluke; see COVERAGE.md round-4 root
cause and ctree_sampled_muzero/lib/cnode.cpp:1016 in the reference).
"""
from lightzero_tpu.config import Config

K = 20

main_config = Config(dict(
    exp_name="data_sez/pendulum_sez_uniformprior_seed0",
    env=dict(env_id="Pendulum-v1", stop_value=-250, collector_env_num=8,
             evaluator_env_num=3, n_evaluator_episode=3),
    policy=dict(
        type="sampled_efficientzero",
        model=dict(observation_shape=3, action_space_size=1,
                   latent_state_dim=128, lstm_hidden_size=128),
        num_simulations=50, num_of_sampled_actions=K, batch_size=256,
        update_per_collect=None, replay_ratio=0.25, n_episode=8, eval_freq=200,
        ssl_loss_weight=2, optim_type="AdamW", learning_rate=1e-4,
        cos_lr_scheduler=True, lstm_horizon_len=5,
        sampled_node_prior="uniform",
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_muzero
    train_muzero(main_config, seed=0, max_env_step=int(8e4))
