"""CartPole ReZero-MuZero: periodic backward-order buffer reanalyze WITH
root-value reuse-search (reference: zoo/classic_control/cartpole/config/
cartpole_rezero_mz_config.py; arXiv:2404.16364)."""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_rezero/cartpole_rezero_mz_seed0",
    env=dict(type="cartpole", stop_value=195, collector_env_num=8,
             evaluator_env_num=3),
    policy=dict(
        type="muzero",
        model=dict(observation_shape=4, action_space_size=2, model_type="mlp",
                   latent_state_dim=128, support_scale=25,
                   self_supervised_learning_loss=True),
        ssl_loss_weight=2.0,
        num_simulations=25, batch_size=256, update_per_collect=100,
        n_episode=8, eval_freq=100,
        # ReZero knobs (train_muzero_segment.py:191-208)
        buffer_reanalyze_freq=1.0, reanalyze_batch_size=160,
        reanalyze_partition=0.75, reuse_search=True,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_rezero
    train_rezero(main_config, seed=0, max_env_step=int(3e4))
