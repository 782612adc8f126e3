"""Go-6x6 AlphaZero round-5 resume.

The round-4 run ended with in-training 4-episode evals at win rate 1.0,
but the honest 24-episode re-eval from params_best lands at 0.79
(data_az/go6_alphazero_seed0/eval_verdict.json) — below the >=0.9 bar the
round-4 verdict set (missing #8). Resume training from the exported best
params with more evaluator episodes per eval (20) so "new best" is
certified on a sample the re-eval harness will agree with.
"""
import importlib.util
import sys

spec = importlib.util.spec_from_file_location(
    "go6cfg", "zoo/board_games/go/config/go6_alphazero_bot_mode_config.py")
mod = importlib.util.module_from_spec(spec)
sys.modules["go6cfg"] = mod
spec.loader.exec_module(mod)
main_config = mod.main_config

main_config["exp_name"] = "data_az/go6_alphazero_resume_seed0"
main_config["env"]["n_evaluator_episode"] = 20
main_config["env"]["evaluator_env_num"] = 10

if __name__ == "__main__":
    from lightzero_tpu.entry import train_alphazero
    train_alphazero(
        main_config, seed=1,
        model_path="data_az/go6_alphazero_seed0/ckpt/params_best",
        max_env_step=int(1e6),
    )
