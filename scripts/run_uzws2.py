"""True continuation of the warm-start UniZero run.

The first continuation attempt re-used the ws config whose model_path
points at the DISTILLED params — and train_muzero skips auto_resume when
an explicit model_path is given, so it restarted from scratch-warm-start
instead of continuing (and its early "new best" saves overwrote the
13.94-level ckpt_best in the working tree; git history a163f14 preserved
it, snapshotted to data_uz/ws_best_snapshot). This runner continues from
that snapshot in a fresh exp dir.
"""
import importlib.util
import sys

spec = importlib.util.spec_from_file_location(
    "wscfg", "zoo/breakout_grid/config/breakout_grid_unizero_ws_config.py")
mod = importlib.util.module_from_spec(spec)
sys.modules["wscfg"] = mod
spec.loader.exec_module(mod)
main_config = mod.main_config
main_config["exp_name"] = "data_uz/breakout_grid_unizero_ws2_seed0"

if __name__ == "__main__":
    from lightzero_tpu.entry import train_unizero
    train_unizero(main_config, seed=1,
                  model_path="data_uz/ws_best_snapshot",
                  max_env_step=int(1e5))
