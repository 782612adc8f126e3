"""Zoo benchmark harness: run a list of env x algo configs, check each
against its eval-return threshold, and write a pass/fail summary.

Role of the reference's zoo/eval_benchmark.py:1-265 (subprocess per
config, eval_episode_return_mean threshold per algorithm, summary log),
rebuilt for this repo's layout: exp dirs log JSONL
(log/train.jsonl, key evaluator/eval_mean_return), and the config file IS
the CLI, so each case is `python <config>` under a wall-clock cap.

Usage:
    python zoo/eval_benchmark.py                # run the default case list
    python zoo/eval_benchmark.py cartpole_muzero pendulum_smz   # subset
Environment:
    LZT_BENCH_CAP_S   per-case wall-clock cap (default 1800)
    JAX_PLATFORMS     forwarded to children (set =cpu for host-only checks)
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# case name -> (config path, exp dir it writes, eval-return threshold)
CASES = {
    "cartpole_muzero": (
        "zoo/classic_control/cartpole/config/cartpole_muzero_config.py",
        "data_muzero/cartpole_muzero_ns25_upc100_rer0_seed0", 195.0),
    "cartpole_rezero": (
        "zoo/classic_control/cartpole/config/cartpole_rezero_mz_config.py",
        "data_rezero/cartpole_rezero_mz_seed0", 195.0),
    "pendulum_smz": (
        "zoo/classic_control/pendulum/config/pendulum_sampled_muzero_config.py",
        "data_smz/pendulum_sampled_muzero_k20_seed0", -200.0),
    "pendulum_sez": (
        "zoo/classic_control/pendulum/config/pendulum_sampled_efficientzero_config.py",
        "data_sez/pendulum_sampled_efficientzero_k20_seed0", -250.0),
    "pendulum_suz": (
        "zoo/classic_control/pendulum/config/pendulum_sampled_unizero_lr1e3_config.py",
        "data_suz/pendulum_sampled_unizero_k16_lr1e3_seed0", -250.0),
    "breakout_grid_muzero": (
        "zoo/breakout_grid/config/breakout_grid_muzero_config.py",
        "data_mz/breakout_grid_muzero_seed0", 25.0),
    "memory_unizero": (
        "zoo/memory/config/memory_unizero_config.py",
        "data_uz/memory10_unizero_seed0", 0.9),
    "tictactoe_muzero": (
        "zoo/board_games/tictactoe/config/tictactoe_muzero_bot_mode_config.py",
        "data_mz/tictactoe_muzero_bot_mode_ns25_seed0", 0.8),
    "connect4_muzero": (
        "zoo/board_games/connect4/config/connect4_muzero_bot_mode_config.py",
        "data_mz/connect4_muzero_ns50_seed0", 0.9),
}


def best_eval_return(exp_dir):
    path = os.path.join(REPO, exp_dir, "log", "train.jsonl")
    if not os.path.exists(path):
        return None
    best = None
    with open(path) as f:
        for line in f:
            try:
                row = json.loads(line)
            except ValueError:
                continue
            v = row.get("evaluator/eval_mean_return")
            if v is not None and (best is None or v > best):
                best = v
    return best


def run_case(name, cap_s):
    config, exp_dir, threshold = CASES[name]
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, config)],
        cwd=REPO, capture_output=True, text=True, timeout=cap_s + 60,
        env={**os.environ, "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", "")},
    ) if cap_s else None
    best = best_eval_return(exp_dir)
    passed = best is not None and best >= threshold
    return dict(case=name, config=config, threshold=threshold,
                best_eval_return=best, passed=passed,
                wall_s=round(time.time() - t0, 1),
                rc=None if proc is None else proc.returncode)


def main():
    names = sys.argv[1:] or list(CASES)
    cap_s = int(os.environ.get("LZT_BENCH_CAP_S", "1800"))
    check_only = os.environ.get("LZT_BENCH_CHECK_ONLY") == "1"
    results = []
    for name in names:
        if name not in CASES:
            print(f"unknown case {name!r}; known: {sorted(CASES)}")
            continue
        if check_only:
            # score existing exp dirs without re-running (reference re-runs
            # always; this mode audits completed runs, e.g. after a queue)
            config, exp_dir, threshold = CASES[name]
            best = best_eval_return(exp_dir)
            results.append(dict(case=name, config=config, threshold=threshold,
                                best_eval_return=best,
                                passed=best is not None and best >= threshold,
                                wall_s=0.0, rc=None))
        else:
            results.append(run_case(name, cap_s))
        print(json.dumps(results[-1]), flush=True)
    summary = dict(
        total=len(results),
        passed=sum(r["passed"] for r in results),
        results=results,
    )
    out = os.path.join(REPO, "benchmark_summary.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"[eval_benchmark] {summary['passed']}/{summary['total']} passed -> {out}")


if __name__ == "__main__":
    main()
