"""All zoo configs import cleanly and compile against their policy defaults
(the reference's config-as-integration pattern, light version)."""
import glob
import importlib.util
import os

import pytest

pytestmark = pytest.mark.unittest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(glob.glob(os.path.join(REPO, "zoo", "**", "config", "*_config.py"), recursive=True))


def _load(path):
    spec = importlib.util.spec_from_file_location(
        "zoo_cfg_" + os.path.basename(path)[:-3], path
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_imports_and_compiles(path, tmp_path, monkeypatch):
    from lightzero_tpu.config import compile_config
    from lightzero_tpu.utils import POLICY_REGISTRY
    import lightzero_tpu.entry  # noqa: F401  (registers all policies)

    monkeypatch.chdir(tmp_path)
    mod = _load(path)
    # multitask entries expose a list of per-task configs instead
    cfgs = ([mod.main_config] if hasattr(mod, "main_config")
            else list(getattr(mod, "task_configs")))
    for cfg in cfgs:
        ptype = cfg.get("policy", {}).get("type", "muzero")
        if "alphazero" in ptype:
            pass  # az entries use their own default merging
        cls = POLICY_REGISTRY.get(ptype)
        compiled = compile_config(cfg, cls.default_config(), seed=0, save_cfg=False)
        assert compiled.policy.num_simulations > 0


def test_zoo_has_configs():
    assert len(CONFIGS) >= 10, CONFIGS
