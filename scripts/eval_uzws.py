"""16-episode deterministic re-eval of the warm-start UniZero run's best
checkpoint (the in-training evaluator uses only 3 episodes; this is the
low-variance verdict, same standard as eval_connect4_best)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lightzero_tpu.entry import eval_muzero
import importlib.util

spec = importlib.util.spec_from_file_location(
    "wscfg", "zoo/breakout_grid/config/breakout_grid_unizero_ws_config.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

EXP = "data_uz/breakout_grid_unizero_ws_seed0"
results = {}
for name in ("ckpt_best", "ckpt_final", "params_best"):
    p = os.path.join(EXP, "ckpt", name)
    if not (os.path.isdir(p) or os.path.exists(p + ".pkl")):
        continue
    res = eval_muzero(mod.main_config, seed=3, model_path=p, n_episodes=16)
    rets = [float(r) for r in res["episode_returns"]]
    results[name] = dict(mean=float(res["mean_return"]), n=len(rets),
                         returns=rets)
    print(f"[uzws-eval] {name}: mean {results[name]['mean']:.2f} over {len(rets)}",
          flush=True)
with open(os.path.join(EXP, "eval_verdict.json"), "w") as f:
    json.dump(results, f, indent=1)
print("[uzws-eval] wrote verdict")
