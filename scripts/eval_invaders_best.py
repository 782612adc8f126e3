"""Honest ckpt_best re-eval for the space-invaders EZ fine-tune (v3).

The in-training evals are 3-episode samples (the round-4/5 verdicts
showed those can be flukes); this scores the committed params_best over
n independent episodes and writes eval_verdict.json next to the run —
the same certification harness pattern as scripts/eval_connect4_best.py.
Reference row: zoo/atari/config/atari_efficientzero_config.py.
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")

from zoo.minatar.config.space_invaders_efficientzero_config import main_config
from lightzero_tpu.entry import eval_muzero

EXP = "data_ez/space_invaders_grid_ez_v3_seed0"
N = int(os.environ.get("LZT_EVAL_EPISODES", "16"))

main_config["exp_name"] = EXP + "_verdict"

if __name__ == "__main__":
    ckpt = os.path.join(EXP, "ckpt", "params_best")
    out = eval_muzero(main_config, seed=19, model_path=ckpt, n_episodes=N)
    verdict = {
        "ckpt": ckpt,
        "n_episodes": N,
        "result": out if isinstance(out, (int, float, dict, list)) else str(out),
    }
    with open(os.path.join(EXP, "eval_verdict.json"), "w") as f:
        json.dump(verdict, f, indent=1)
    print(json.dumps(verdict))
