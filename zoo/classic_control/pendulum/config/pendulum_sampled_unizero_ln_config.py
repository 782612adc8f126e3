"""Pendulum Sampled-UniZero with LayerNorm latents — the root-cause A/B.

Probes on the flat runs showed the world model's reward head is action-
INVARIANT (teacher-forced training lets it read reward off the obs token)
and obs_pred carries only ~half the true action effect: with SimNorm+MSE
latents the small action-induced embedding shifts are second-order in the
loss, so the search cannot differentiate candidates and the visit targets
stay uniform. The reference's continuous-control sampled-unizero default
is final_norm_option_in_encoder='LayerNorm' with MSE
(lzero/policy/sampled_unizero.py:124-133). Everything else matches the
flat baseline run (K=16, sims 50, lr 1e-4)."""
import copy
import importlib.util

spec = importlib.util.spec_from_file_location(
    "suz_base",
    __file__.replace("_ln", ""),
)
_base = importlib.util.module_from_spec(spec)
spec.loader.exec_module(_base)

main_config = copy.deepcopy(_base.main_config)
main_config["exp_name"] = "data_suz/pendulum_sampled_unizero_k16_ln_seed0"
main_config["policy"]["model"]["final_norm_option_in_encoder"] = "LayerNorm"
main_config["policy"]["auto_resume"] = True
main_config["policy"]["save_ckpt_freq"] = 2000

if __name__ == "__main__":
    from lightzero_tpu.entry import train_unizero

    train_unizero(main_config, seed=0, max_env_step=int(1e5))
