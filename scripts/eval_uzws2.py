"""16-episode re-eval for the ws2 continuation run (same standard as
scripts/eval_uzws.py, pointed at the ws2 exp dir)."""
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

EXP = "data_uz/breakout_grid_unizero_ws2_seed0"
results = {}
for name in ("ckpt_best", "params_best"):
    p = os.path.join(EXP, "ckpt", name)
    if not (os.path.isdir(p) or os.path.exists(p + ".pkl")):
        continue
    res = eval_muzero(mod.main_config, seed=5, model_path=p, n_episodes=16)
    rets = [float(r) for r in res["episode_returns"]]
    results[name] = dict(mean=float(res["mean_return"]), n=len(rets), returns=rets)
    print(f"[uzws2-eval] {name}: mean {results[name]['mean']:.2f} over {len(rets)}", flush=True)
with open(os.path.join(EXP, "eval_verdict.json"), "w") as f:
    json.dump(results, f, indent=1)
print("[uzws2-eval] wrote verdict")
