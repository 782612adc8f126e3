"""CPU preflight for the round-3 TPU queue: run every queued config's
actual entry with shrunken sizes and a ~tiny env-step budget to catch
runtime wiring errors (env creation, model shapes, target assembly)
BEFORE burning single-tenant TPU wall-clock on them.

Shrinks only capacity knobs (sims, batch, dims, update counts) — the env,
policy type, obs/action wiring, and entry are the real ones.
"""
import jax

jax.config.update("jax_platforms", "cpu")

import copy
import importlib.util
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_cfg(path, name="main_config"):
    spec = importlib.util.spec_from_file_location("cfg_" + os.path.basename(path), path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return copy.deepcopy(getattr(m, name))


def shrink(cfg, exp):
    cfg["exp_name"] = exp
    cfg["env"]["collector_env_num"] = 2
    cfg["env"]["evaluator_env_num"] = 2
    p = cfg["policy"]
    p["num_simulations"] = 6
    p["batch_size"] = 16
    p["update_per_collect"] = 2
    p["n_episode"] = 2
    p["eval_freq"] = 10_000_000  # skip mid-run eval: preflight only needs collect+train
    m = p.get("model", {})
    for k, v in dict(latent_state_dim=32, embed_dim=64, num_heads=2, num_layers=1,
                     num_channels=16, lstm_hidden_size=32).items():
        if k in m:
            m[k] = v
    if "num_of_sampled_actions" in p:
        p["num_of_sampled_actions"] = 4
    return cfg


FAILED = []


def check(name, fn):
    print(f"[preflight] {name} ...", flush=True)
    try:
        fn()
        print(f"[preflight] {name} OK", flush=True)
    except Exception:
        FAILED.append(name)
        traceback.print_exc()
        print(f"[preflight] {name} FAILED", flush=True)


from lightzero_tpu.entry import (
    train_alphazero,
    train_multitask_balance,
    train_muzero,
    train_unizero,
)

check("uz768-wiring", lambda: train_unizero(
    shrink(load_cfg("zoo/breakout_grid/config/breakout_grid_unizero_768_config.py"),
           "data_preflight/uz768"), seed=0, max_env_step=60))

def _c4resume():
    # the resume entry loads a FULL-SIZE checkpoint, so model dims must stay
    # at the trained size — shrink only the search/batch knobs
    cfg = load_cfg("zoo/board_games/connect4/config/connect4_muzero_resume_config.py")
    cfg["exp_name"] = "data_preflight/c4resume"
    cfg["env"]["collector_env_num"] = 2
    cfg["env"]["evaluator_env_num"] = 2
    p = cfg["policy"]
    p["num_simulations"] = 6
    p["batch_size"] = 16
    p["update_per_collect"] = 2
    p["n_episode"] = 2
    p["eval_freq"] = 10_000_000
    train_muzero(cfg, seed=1,
                 model_path="data_mz/connect4_muzero_ns50_seed0/ckpt/iteration_30000",
                 max_env_step=80)


check("c4resume", _c4resume)


def _scalezero():
    import importlib.util as iu
    spec = iu.spec_from_file_location(
        "sz_cfg", "zoo/multitask/config/pendulum_suite_scalezero_config.py")
    m = iu.module_from_spec(spec)
    spec.loader.exec_module(m)
    tcs = copy.deepcopy(m.task_configs)
    for i, tc in enumerate(tcs):
        shrink(tc, f"data_preflight/scalezero_t{i}")
    train_multitask_balance(tcs, seed=0, max_env_step=120)


check("scalezero", _scalezero)

check("memory100", lambda: train_unizero(
    shrink(load_cfg("zoo/memory/config/memory100_unizero_config.py"),
           "data_preflight/memory100"), seed=0, max_env_step=60))

check("gomoku-az", lambda: train_alphazero(
    shrink(load_cfg("zoo/board_games/gomoku/config/gomoku_alphazero_bot_mode_config.py"),
           "data_preflight/gomoku"), seed=0, max_env_step=60))

check("freeway", lambda: train_muzero(
    shrink(load_cfg("zoo/minatar/config/freeway_muzero_config.py"),
           "data_preflight/freeway"), seed=0, max_env_step=60))

check("invaders", lambda: train_muzero(
    shrink(load_cfg("zoo/minatar/config/space_invaders_efficientzero_config.py"),
           "data_preflight/invaders"), seed=0, max_env_step=60))

print("[preflight] failed:", FAILED if FAILED else "none", flush=True)
sys.exit(1 if FAILED else 0)
