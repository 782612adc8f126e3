"""Pendulum Sampled-UniZero v2 continuation.

The first v2 run stopped at 9.7k env steps when a single 3-episode eval
spiked to -171 (true 9-episode mean of that ckpt: -592). This warm-starts
from its final params and trains on with the round-4 confirmed-stop rule
(stop_consecutive_evals=2) so a lone spike can no longer end the run.
"""
import copy

from zoo.classic_control.pendulum.config.pendulum_sampled_unizero_v2_config import (
    main_config as _v2,
)

main_config = copy.deepcopy(_v2)
main_config["exp_name"] = "data_suz/pendulum_sampled_unizero_v2_cont_seed0"
main_config["policy"]["stop_consecutive_evals"] = 2

if __name__ == "__main__":
    from lightzero_tpu.entry import train_unizero

    train_unizero(
        main_config,
        seed=0,
        model_path="data_suz/pendulum_sampled_unizero_v2_seed0/ckpt/ckpt_final",
        max_env_step=int(4e4),
    )
