"""Jericho text-adventure UniZero (reference
zoo/jericho/configs/jericho_unizero_config.py: detective.z5, 10 action
templates, BGE tokenizer + HF language encoder). GATED: requires the
jericho package and game ROMs plus HF encoder weights (absent from this
image — config compiles, run raises with a clear message)."""
from lightzero_tpu.config import Config

game = "detective.z5"
max_seq_len = 512

main_config = Config(dict(
    exp_name=f"data_uz/jericho_{game.split('.')[0]}_unizero_seed0",
    env=dict(env_id="jericho", stop_value=int(1e6), collector_env_num=4,
             evaluator_env_num=2,
             env_kwargs=dict(game_path=f"z-machine-games/jericho-game-suite/{game}",
                             max_action_num=10, max_seq_len=max_seq_len,
                             tokenizer_path="BAAI/bge-base-en-v1.5",
                             remove_stuck_actions=True)),
    policy=dict(
        type="unizero",
        model=dict(observation_shape=max_seq_len, action_space_size=10,
                   # text-encoder observation path (models/text_encoders.py,
                   # reference common.py:478 HFLanguageRepresentationNetwork)
                   obs_encoder="hf_language", encoder_model="BAAI/bge-base-en-v1.5",
                   embed_dim=768, num_layers=2, num_heads=8, max_tokens=20,
                   support_scale=300),
        num_simulations=50, num_unroll_steps=10, batch_size=64,
        update_per_collect=100, n_episode=4, eval_freq=1000, learning_rate=1e-4,
    ),
))

if __name__ == "__main__":
    from lightzero_tpu.entry import train_unizero
    train_unizero(main_config, seed=0, max_env_step=int(1e6))
