"""Fresh space-invaders-grid EfficientZero run (round-4c).

The round-4 run (data_ez/space_invaders_grid_ez_seed0) was monotone-improving
at eval 13.3 @ 30k env steps when its 40-min queue cap hit; the sandbox then
restarted and its (gitignored) checkpoints were lost, so this is a from-scratch
rerun of the same recipe with a longer cap. Writes to a new exp dir so the
capped run's committed curve stays intact as evidence.
"""
from zoo.minatar.config.space_invaders_efficientzero_config import main_config
from lightzero_tpu.entry import train_muzero

main_config["exp_name"] = "data_ez/space_invaders_grid_ez_v2_seed0"

if __name__ == "__main__":
    train_muzero(main_config, seed=0, max_env_step=int(3e5))
