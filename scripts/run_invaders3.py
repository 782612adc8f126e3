"""Space-invaders-grid EfficientZero, round-5 resume with reanalyze.

The v2 run plateaued at eval ~14-16 from 68k to 152k env steps (stop 18)
with reanalyze_ratio=0.0 and a never-evicting 1e6 buffer: policy/value
targets recorded by searches tens of thousands of steps old keep being
replayed verbatim — the target-staleness failure the round-4 verdict told
us to check before adding steps (missing #5). This resume keeps the run
dir (auto_resume restores params/counters; the buffer itself restarts
fresh) and turns on reanalyze_ratio=0.25 so a quarter of every batch gets
fresh targets from the CURRENT target net, the reference's own remedy
(reanalyze in game_buffer_efficientzero.py).
"""
from zoo.minatar.config.space_invaders_efficientzero_config import main_config
from lightzero_tpu.entry import train_muzero

main_config["exp_name"] = "data_ez/space_invaders_grid_ez_v2_seed0"
main_config["policy"]["reanalyze_ratio"] = 0.25

if __name__ == "__main__":
    train_muzero(main_config, seed=0, max_env_step=int(3e5))
