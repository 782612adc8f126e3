"""CPU fallback for the ScaleZero 3-task demo while the TPU tunnel is
down: same tasks/policy as pendulum_suite_scalezero_config, with the
search/batch knobs reduced for a 1-core host. Goal: every task's eval
return improving over its random-policy start (~-1400).
"""
import jax

jax.config.update("jax_platforms", "cpu")

import copy
import sys

sys.path.insert(0, "/root/repo")

from zoo.multitask.config.pendulum_suite_scalezero_config import task_configs
from lightzero_tpu.entry import train_multitask_balance

tcs = copy.deepcopy(task_configs)
for tc in tcs:
    tc["exp_name"] = "data_mt/pendulum_suite_scalezero_cpu_seed0"
    tc["env"]["collector_env_num"] = 3
    tc["env"]["evaluator_env_num"] = 2
    p = tc["policy"]
    p.update(num_simulations=12, batch_size=48, update_per_collect=30,
             num_of_sampled_actions=6, eval_freq=20)

train_multitask_balance(tcs, seed=0, max_env_step=int(1e5))
