"""Pendulum Sampled-MuZero (K=20 tanh-Gaussian) — post-root-cause run.

Same recipe as pendulum_sampled_muzero_config.py, but with the round-4
fix active: pUCT consumes a UNIFORM empirical prior over the K sampled
candidates (the reference's production C++ default,
ctree_sampled_muzero/lib/cnode.cpp:1016 — "uniform is very important to
the performance of sampled algo"), not the density prior of the python
ptree that caused the sigma-collapse feedback loop (COVERAGE.md round-4
root cause).  This exp dir is the honest benchmark source for the
pendulum_smz row after the fluke retraction.
"""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_smz/pendulum_smz_uniformprior_seed0",
    env=dict(env_id="Pendulum-v1", stop_value=-250,
             collector_env_num=8, evaluator_env_num=3,
             n_evaluator_episode=3),
    policy=dict(
        type="sampled_muzero",
        model=dict(observation_shape=3, action_space_size=1,
                   model_type="mlp", latent_state_dim=128,
                   support_scale=300, self_supervised_learning_loss=True,
                   norm_type="LN", continuous_action_space=True),
        batch_size=256, optim_type="AdamW", learning_rate=1e-4,
        num_unroll_steps=5, td_steps=5, discount_factor=0.997,
        num_simulations=50, num_of_sampled_actions=20,
        sampled_node_prior="uniform",
        ssl_loss_weight=2, policy_entropy_weight=5e-3,
        eval_freq=200, replay_ratio=0.25, n_episode=8,
        game_segment_length=200, cos_lr_scheduler=True,
        grad_clip_value=10.0,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_muzero
    train_muzero(main_config, seed=0, max_env_step=int(1e5))
