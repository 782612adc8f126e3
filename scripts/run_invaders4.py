"""Space-invaders-grid EfficientZero, round-5 warm-start fine-tune (v3).

Why this exists (vs scripts/run_invaders3.py): run_invaders3 relied on
auto_resume, but the periodic checkpoints + resume_meta.json sidecar are
gitignored — after the round-5 VM restart only the committed
`ckpt/params_best` export (the eval-16.3 snapshot from the v2 run)
survives. So the staleness fix prescribed by the round-4 verdict
(missing #5) is applied as a WARM-START fine-tune instead:

- model_path = the committed v2 params_best (lenient params-only load,
  entry/train_muzero.py:145);
- fresh replay buffer (the stale-target buffer is exactly what the
  verdict blamed for the 68k->154k decline);
- reanalyze_ratio = 0.25 so a quarter of every batch gets fresh policy
  targets from the CURRENT target net — the reference's own remedy
  (reference lzero/mcts/buffer/game_buffer_efficientzero.py reanalyze).
- fixed temperature 0.25: params are already trained (the v2 run spent
  150k steps); restarting the manual decay schedule at 1.0 would undo
  the policy with high-temperature noise.

Reference row: zoo/atari/config/atari_efficientzero_config.py.
"""
from zoo.minatar.config.space_invaders_efficientzero_config import main_config
from lightzero_tpu.entry import train_muzero

main_config["exp_name"] = "data_ez/space_invaders_grid_ez_v3_seed0"
main_config["policy"]["reanalyze_ratio"] = 0.25
main_config["policy"]["manual_temperature_decay"] = False
main_config["policy"]["fixed_temperature_value"] = 0.25
main_config["policy"]["auto_resume"] = True  # periodic ckpts for any future resume

if __name__ == "__main__":
    train_muzero(
        main_config,
        seed=0,
        max_env_step=int(3e5),
        model_path="data_ez/space_invaders_grid_ez_v2_seed0/ckpt/params_best",
    )
