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
import importlib.util
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:  # configs import lightzero_tpu
    sys.path.insert(0, REPO)

# Deterministic episodes for the ckpt_best re-eval verdict. The round-4
# retraction showed the 2-3-episode training-time eval spikes can be
# flukes (a "solved" smz row re-evaluated to -830), so a case only PASSES
# on a multi-episode re-eval of its best checkpoint, like the reference's
# separate eval entry (lzero/entry/eval_muzero.py), not on the best
# training-log point.
REEVAL_EPISODES = int(os.environ.get("LZT_BENCH_REEVAL_EPISODES", "10"))

# case name -> (config path, exp dir it writes, eval-return threshold)
CASES = {
    "cartpole_muzero": (
        "zoo/classic_control/cartpole/config/cartpole_muzero_config.py",
        "data_muzero/cartpole_muzero_ns25_upc100_rer0_seed0", 195.0),
    "cartpole_rezero": (
        "zoo/classic_control/cartpole/config/cartpole_rezero_mz_config.py",
        "data_rezero/cartpole_rezero_mz_seed0", 195.0),
    # the three sampled-family rows point at POST-fix runs (uniform pUCT
    # prior over sampled candidates); the pre-fix exp dirs' spikes were
    # retracted as flukes (COVERAGE.md round-4 root cause).
    "pendulum_smz": (
        "zoo/classic_control/pendulum/config/pendulum_smz_uniform_config.py",
        "data_smz/pendulum_smz_uniformprior_seed0", -250.0),
    "pendulum_sez": (
        "zoo/classic_control/pendulum/config/pendulum_sez_uniform_config.py",
        "data_sez/pendulum_sez_uniformprior_seed0", -250.0),
    "pendulum_suz": (
        "zoo/classic_control/pendulum/config/pendulum_sampled_unizero_v2_config.py",
        "data_suz/pendulum_sampled_unizero_v2_seed0", -250.0),
    "breakout_grid_muzero": (
        "zoo/breakout_grid/config/breakout_grid_muzero_config.py",
        "data_mz/breakout_grid_muzero_seed0", 25.0),
    "memory_unizero": (
        "zoo/memory/config/memory_unizero_config.py",
        "data_uz/memory10_unizero_seed0", 0.9),
    # round-4 conv + long-context capability rows
    "freeway_muzero": (
        "zoo/minatar/config/freeway_muzero_config.py",
        "data_mz/freeway_grid_muzero_seed0", 18.0),
    "memory100_unizero": (
        "zoo/memory/config/memory100_unizero_v2_config.py",
        "data_uz/memory100_unizero_v2_seed0", 0.9),
    # round-5 v2 top-up (connect4-proven recipe); the round-2 run peaked at
    # 0.8 with no surviving checkpoint
    "tictactoe_muzero": (
        "zoo/board_games/tictactoe/config/tictactoe_muzero_v2_config.py",
        "data_mz/tictactoe_muzero_v2_seed0", 0.8),
    # from-scratch augmented rerun: the ns50 run + its continuation lost all
    # checkpoints to the sandbox restart (recorded verdicts: 0.857/0.824)
    "connect4_muzero": (
        "zoo/board_games/connect4/config/connect4_muzero_aug_config.py",
        "data_mz/connect4_muzero_aug_seed0", 0.9),
    # round-5 stabilization fine-tune from the aug run's ckpt_best
    "connect4_muzero_ft": (
        "zoo/board_games/connect4/config/connect4_muzero_ft_config.py",
        "data_mz/connect4_muzero_ft_seed0", 0.9),
}


def _load_main_config(config_path):
    spec = importlib.util.spec_from_file_location(
        "bench_case_config", os.path.join(REPO, config_path))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.main_config


# board-game cases pass on WIN-RATE vs the rule bot (the reference's
# "masters board games" claim, /root/reference/README.md:267-272), not on
# mean return (a draw would otherwise count like half a loss).
BOARD_CASES = {"tictactoe_muzero", "connect4_muzero"}


def resolve_eval_ckpt(exp_abs):
    """Best evaluable checkpoint for an exp dir: the full ckpt_best when it
    survives, else the durable params-only export (full checkpoints are
    gitignored and die with the sandbox; params_best restores leniently —
    trained params + fresh opt_state, which is all eval needs)."""
    for name in ("ckpt_best", "params_best"):
        p = os.path.join(exp_abs, "ckpt", name)
        if os.path.isdir(p):
            return p
        # save_checkpoint falls back to '<path>.pkl' when orbax is absent;
        # load_checkpoint already resolves the .pkl form
        if os.path.exists(p + ".pkl"):
            return p + ".pkl"
    return None


def reeval_ckpt_best(config_path, exp_dir, n_episodes=REEVAL_EPISODES):
    """Deterministic multi-episode re-eval of <exp_dir>/ckpt/ckpt_best.

    Returns (mean_return, win_rate, n_episodes); (None, None, 0) when no
    best checkpoint exists yet.
    """
    ckpt = resolve_eval_ckpt(os.path.join(REPO, exp_dir))
    if ckpt is None:
        return None, None, 0
    import copy
    from lightzero_tpu.entry import eval_muzero
    cfg = copy.deepcopy(_load_main_config(config_path))
    res = eval_muzero(cfg, seed=0, model_path=ckpt, n_episodes=n_episodes)
    rets = [float(r) for r in res["episode_returns"]]
    win_rate = sum(r > 0 for r in rets) / len(rets) if rets else None
    return float(res["mean_return"]), win_rate, len(rets)


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
    result = score_case(name)
    result.update(wall_s=round(time.time() - t0, 1),
                  rc=None if proc is None else proc.returncode)
    return result


def score_case(name):
    """Score a case from its exp dir: the verdict is the multi-episode
    ckpt_best re-eval; the training-log best is recorded alongside for
    curve context but no longer decides pass/fail."""
    config, exp_dir, threshold = CASES[name]
    best = best_eval_return(exp_dir)
    try:
        reeval_mean, win_rate, reeval_n = reeval_ckpt_best(config, exp_dir)
    except Exception as e:  # missing exp dir / incompatible ckpt
        print(f"[eval_benchmark] reeval {name} failed: {e}", file=sys.stderr)
        reeval_mean, win_rate, reeval_n = None, None, 0
    verdict = win_rate if name in BOARD_CASES else reeval_mean
    passed = verdict is not None and verdict >= threshold
    return dict(case=name, config=config, threshold=threshold,
                best_eval_return=best,
                reeval_mean=reeval_mean, reeval_win_rate=win_rate,
                reeval_episodes=reeval_n,
                passed=passed, wall_s=0.0, rc=None)


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
            results.append(score_case(name))
        else:
            results.append(run_case(name, cap_s))
        print(json.dumps(results[-1]), flush=True)
    out = os.path.join(REPO, "benchmark_summary.json")
    # subset runs MERGE into the existing summary (replace matching case
    # rows, keep the rest) so a targeted rescore never clobbers the table
    merged = {r["case"]: r for r in results}
    if len(names) < len(CASES) and os.path.exists(out):
        try:
            with open(out) as f:
                for r in json.load(f).get("results", []):
                    merged.setdefault(r["case"], r)
        except Exception:
            pass
    # stable order: CASES order first, then any legacy rows
    ordered = [merged[n] for n in CASES if n in merged]
    ordered += [r for c, r in merged.items() if c not in CASES]
    summary = dict(
        total=len(ordered),
        passed=sum(bool(r["passed"]) for r in ordered),
        results=ordered,
    )
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"[eval_benchmark] {summary['passed']}/{summary['total']} passed -> {out}")


if __name__ == "__main__":
    main()
