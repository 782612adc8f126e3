"""Execute the host-env (gymnasium / dm_control) training path end-to-end
on CPU with tiny budgets: proves HostEnv + host collector/evaluator run
against the REAL libraries (gymnasium 1.2.2 + dm_control are live in this
image), not just compile. Writes a summary JSON to data_host/smoke.json.

Reference paths being exercised:
  zoo/box2d/lunarlander/config/lunarlander_disc_muzero_config.py
  zoo/dmc2gym/config/dmc2gym_state_suite (dmc2gym_lightzero_env.py)
"""
import jax

jax.config.update("jax_platforms", "cpu")

import copy
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lightzero_tpu.entry import train_muzero

results = {}


def shrink(cfg, exp):
    cfg = copy.deepcopy(cfg)
    cfg["exp_name"] = exp
    cfg["env"]["collector_env_num"] = 2
    cfg["env"]["evaluator_env_num"] = 2
    p = cfg["policy"]
    p["num_simulations"] = 8
    p["batch_size"] = 32
    p["update_per_collect"] = 4
    p["n_episode"] = 2
    p["eval_freq"] = 100
    if "model" in p and "latent_state_dim" in p["model"]:
        p["model"]["latent_state_dim"] = 64
    if "lstm_hidden_size" in p.get("model", {}):
        p["model"]["lstm_hidden_size"] = 64
    if "num_of_sampled_actions" in p:
        p["num_of_sampled_actions"] = 5
    return cfg


def tail_log(exp):
    path = os.path.join(exp, "log", "train.jsonl")
    with open(path) as f:
        rows = [json.loads(l) for l in f if l.strip()]
    return rows[-1] if rows else None


# 1. gymnasium Box2D (LunarLander discrete) through the host adapter
from zoo.box2d.lunarlander.config.lunarlander_disc_muzero_config import (
    main_config as ll_cfg,
)

exp = "data_host/lunarlander_smoke"
train_muzero(shrink(ll_cfg, exp), seed=0, max_env_step=700)
results["lunarlander_disc_muzero"] = tail_log(exp)
print("[host-smoke] lunarlander:", results["lunarlander_disc_muzero"], flush=True)

# 2. dm_control (dmc2gym cartpole-swingup) through the host adapter,
#    sampled-EfficientZero continuous control
from zoo.dmc2gym.config.dmc2gym_state_sez_config import main_config as dmc_cfg

exp = "data_host/dmc2gym_smoke"
train_muzero(shrink(dmc_cfg, exp), seed=0, max_env_step=700)
results["dmc2gym_state_sez"] = tail_log(exp)
print("[host-smoke] dmc2gym:", results["dmc2gym_state_sez"], flush=True)

os.makedirs("data_host", exist_ok=True)
with open("data_host/smoke.json", "w") as f:
    json.dump(results, f, indent=1, default=float)
print("[host-smoke] OK -> data_host/smoke.json", flush=True)
