"""Per-task ckpt_best re-eval for a ScaleZero (multitask balance) run.

Round-4 verdict missing #4: the v2 suite's "solved" claim had no saved
checkpoint to re-verify against. This harness loads the durable
params_best export (or ckpt_best) of a balance run, rebuilds the shared
multitask policy, and evaluates EVERY task for >= N episodes from its
task-conditioned view — the same multi-episode honesty standard used by
scripts/eval_connect4_best.py. Writes <exp>/eval_verdict.json.

Usage: python scripts/eval_scalezero_best.py <config.py> [n_episodes] [seed]
"""
import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from lightzero_tpu.utils.jax_setup import setup_jax

setup_jax()

CONFIG = sys.argv[1] if len(sys.argv) > 1 else (
    "zoo/multitask/config/pendulum_suite_scalezero_v3_config.py")
N_EPISODES = int(sys.argv[2]) if len(sys.argv) > 2 else 12
SEED = int(sys.argv[3]) if len(sys.argv) > 3 else 11

spec = importlib.util.spec_from_file_location("sz_cfg", CONFIG)
mod = importlib.util.module_from_spec(spec)
os.environ["LIGHTZERO_SKIP_MAIN"] = "1"
spec.loader.exec_module(mod)
cfgs = mod.task_configs

from lightzero_tpu.config import Config, compile_config
from lightzero_tpu.entry.train_muzero import create_env
from lightzero_tpu.utils import POLICY_REGISTRY
from lightzero_tpu.utils.checkpoint import load_checkpoint_lenient
from lightzero_tpu.workers import Evaluator

cfgs = [Config(dict(c)) for c in cfgs]
policy_cls = POLICY_REGISTRY.get(cfgs[0].policy.type)
cfg0 = compile_config(cfgs[0], policy_cls.default_config(), SEED, save_cfg=False)
pcfg = cfg0.policy
if "task_num" in pcfg:
    pcfg.task_num = len(cfgs)

rng = jax.random.PRNGKey(SEED)
policy = policy_cls(pcfg)
rng, init_rng = jax.random.split(rng)
state = policy.init_train_state(init_rng)

exp = cfg0.exp_name
ckpt = None
for name in ("params_best", "ckpt_best"):
    p = os.path.join(exp, "ckpt", name)
    if os.path.isdir(p) or os.path.exists(p + ".pkl"):
        ckpt = p
        break
assert ckpt, f"no params_best/ckpt_best under {exp}/ckpt"
state = load_checkpoint_lenient(ckpt, target=state)

is_mt = hasattr(policy, "task_view")
verdict = {"ckpt": ckpt, "n_episodes": N_EPISODES, "tasks": []}
for ti, c in enumerate(cfgs):
    env = create_env(c.env)
    rng, e_rng = jax.random.split(rng)
    pol_t = policy.task_view(ti) if is_mt else policy
    ev = Evaluator(env, pol_t, max(2, int(c.env.get("evaluator_env_num", 2))), rng=e_rng)
    res = ev.eval(state.params, n_episodes=N_EPISODES)
    row = dict(
        task=ti,
        mean_return=float(res["mean_return"]),
        returns=[float(x) for x in res.get("episode_returns", [])],
        solved_bar=float(c.env.get("solved_threshold", c.env.get("stop_value", 0.0))),
    )
    row["solved"] = row["mean_return"] >= row["solved_bar"]
    verdict["tasks"].append(row)
    print(f"task{ti}: mean {row['mean_return']:.1f} (bar {row['solved_bar']}) "
          f"solved={row['solved']}", flush=True)

verdict["all_solved"] = all(t["solved"] for t in verdict["tasks"])
out = os.path.join(exp, "eval_verdict.json")
with open(out, "w") as f:
    json.dump(verdict, f, indent=1)
print("wrote", out, "all_solved:", verdict["all_solved"])
