"""LunarLander discrete ReZero-MuZero: periodic whole-buffer reanalyze +
root-value reuse-search (reference:
zoo/box2d/lunarlander/config/lunarlander_disc_rezero_mz_config.py;
arXiv:2404.16364)."""
from lightzero_tpu.config import Config

main_config = Config(dict(
    exp_name="data_rezero/lunarlander_disc_rezero_mz_seed0",
    env=dict(env_id="LunarLander-v3", stop_value=240, collector_env_num=8,
             evaluator_env_num=3, n_evaluator_episode=3),
    policy=dict(
        type="muzero",
        model=dict(observation_shape=8, action_space_size=4, model_type="mlp",
                   latent_state_dim=256, self_supervised_learning_loss=True),
        num_simulations=50, batch_size=256, update_per_collect=100,
        n_episode=8, eval_freq=200, ssl_loss_weight=2,
        buffer_reanalyze_freq=1.0, reanalyze_batch_size=160,
        reanalyze_partition=0.75, reuse_search=True,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_rezero
    train_rezero(main_config, seed=0, max_env_step=int(1e6))
