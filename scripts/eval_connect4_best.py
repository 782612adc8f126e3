"""Evaluate the trained Connect4 MuZero checkpoints vs the rule bot over
many episodes (the training-time eval uses only 5 episodes, so a single
blunder swings the mean by 0.4 — this is the low-variance verdict run).

Reference parity target: MuZero masters Connect4 bot-mode
(/root/reference/README.md:267-272). Done = eval_mean >= +0.9.
"""
import copy
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lightzero_tpu.entry import eval_muzero
from zoo.board_games.connect4.config.connect4_muzero_bot_mode_config import main_config

EXP = os.environ.get("C4_EVAL_EXP", "data_mz/connect4_muzero_ns50_seed0")
N_EPISODES = int(os.environ.get("C4_EVAL_EPISODES", "20"))
EVAL_SIMS = int(os.environ.get("C4_EVAL_SIMS", "0"))  # 0 = config default
CKPTS = os.environ.get("C4_EVAL_CKPTS", "ckpt_best,iteration_30000").split(",")

results = {}
for name in CKPTS:
    path = os.path.join(EXP, "ckpt", name)
    if not os.path.isdir(path):
        continue
    cfg = copy.deepcopy(main_config)
    if EVAL_SIMS:
        cfg["policy"]["num_simulations"] = EVAL_SIMS
    res = eval_muzero(cfg, seed=0, model_path=path, n_episodes=N_EPISODES)
    rets = [float(r) for r in res["episode_returns"]]
    results[name] = dict(
        mean=res["mean_return"],
        n=len(rets),
        wins=sum(r > 0 for r in rets),
        draws=sum(r == 0 for r in rets),
        losses=sum(r < 0 for r in rets),
    )
    print(f"[c4eval] {name}: {results[name]}", flush=True)

out = os.path.join(EXP, "eval_verdict.json")
with open(out, "w") as f:
    json.dump(results, f, indent=1)
print(f"[c4eval] wrote {out}", flush=True)
