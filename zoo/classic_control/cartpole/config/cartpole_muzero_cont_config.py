"""CartPole MuZero continuation to a genuinely-solved checkpoint.

The first run stopped when one 3-episode eval hit 197; the 10-episode
re-eval of that ckpt_best gives ~189-192 < 195, i.e. the stop was
premature (same fluke-stop failure mode as the pendulum sampled runs).
Warm-start and train until TWO consecutive evals reach 200 (CartPole's
max return), so ckpt_best is a true >=195 policy.
"""
import copy

from zoo.classic_control.cartpole.config.cartpole_muzero_config import (
    main_config as _base,
)

main_config = copy.deepcopy(_base)
main_config["exp_name"] = "data_muzero/cartpole_muzero_cont_seed0"
main_config["env"]["stop_value"] = 200
main_config["policy"]["stop_consecutive_evals"] = 2

if __name__ == "__main__":
    from lightzero_tpu.entry import train_muzero

    train_muzero(
        main_config,
        seed=0,
        model_path="data_muzero/cartpole_muzero_ns25_upc100_rer0_seed0/ckpt/ckpt_best",
        max_env_step=int(1.5e4),
    )
