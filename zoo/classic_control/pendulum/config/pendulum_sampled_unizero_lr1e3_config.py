"""Pendulum Sampled-UniZero lr A/B: the lr=1e-4 run
(data_suz/pendulum_sampled_unizero_k16_seed0) left the WORLD MODEL
learning on track (value/reward/obs losses match the healthy
sampled-muzero run step for step) but the mu-head effectively at init —
policy_loss pinned at the uniform-CE floor for 86k env steps. At 1e-4 the
policy saw ~30x fewer effective updates than the solved sampled-muzero
run's 3e-3. This variant only changes learning_rate -> 1e-3 (the lr the
solved memory10 UniZero run used)."""
import copy
import importlib.util

spec = importlib.util.spec_from_file_location(
    "suz_base",
    __file__.replace("_lr1e3", ""),
)
_base = importlib.util.module_from_spec(spec)
spec.loader.exec_module(_base)

main_config = copy.deepcopy(_base.main_config)
main_config["exp_name"] = "data_suz/pendulum_sampled_unizero_k16_lr1e3_seed0"
main_config["policy"]["learning_rate"] = 1e-3
main_config["policy"]["auto_resume"] = True
main_config["policy"]["save_ckpt_freq"] = 2000

if __name__ == "__main__":
    from lightzero_tpu.entry import train_unizero

    train_unizero(main_config, seed=0, max_env_step=int(1e5))
