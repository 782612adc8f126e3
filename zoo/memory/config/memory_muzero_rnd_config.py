"""Memory env MuZero + RND intrinsic reward (reference
zoo/memory/config/memory_muzero_rnd_config.py: exploration bonus for the
sparse delayed cue reward; intrinsic_reward_type='add')."""
from lightzero_tpu.config import Config

memory_length = 10

main_config = Config(dict(
    exp_name=f"data_mz/memory{memory_length}_muzero_rnd_seed0",
    env=dict(env_id="memory", stop_value=0.95,
             collector_env_num=8, evaluator_env_num=4, n_evaluator_episode=8,
             env_kwargs=dict(num_cues=4, memory_length=memory_length)),
    policy=dict(
        type="muzero",
        model=dict(observation_shape=3 + 4 + 1, action_space_size=4,
                   model_type="mlp", latent_state_dim=128, support_scale=5),
        num_simulations=50,
        num_unroll_steps=memory_length + 2,
        td_steps=memory_length + 2,
        batch_size=256, update_per_collect=100, n_episode=8,
        eval_freq=150, discount_factor=1.0, ssl_loss_weight=2,
    ),
    reward_model=dict(type="rnd", intrinsic_reward_weight=0.003,
                      input_type="obs", hidden_dim=256),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_muzero_with_reward_model
    train_muzero_with_reward_model(main_config, seed=0, max_env_step=int(1e6))
