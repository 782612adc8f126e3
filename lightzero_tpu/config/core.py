"""Config tree + experiment compilation.

Keeps the reference's "config file IS the experiment" UX (SURVEY.md §5.6;
reference: ding compile_config merging per-policy ``default_config`` with the
user's ``main_config``, lzero/policy/muzero.py:37-237) without the ding
dependency: a ``Config`` is a plain attribute-accessible dict tree;
``compile_config`` deep-merges defaults under user overrides and stamps the
experiment directory.
"""
from __future__ import annotations

import copy
import json
import os
import time
from typing import Any, Dict, Optional


class Config(dict):
    """Attribute-accessible nested dict (EasyDict-like, self-contained)."""

    def __init__(self, d: Optional[Dict] = None, **kwargs):
        super().__init__()
        d = dict(d or {})
        d.update(kwargs)
        for k, v in d.items():
            self[k] = v

    @staticmethod
    def _wrap(v: Any) -> Any:
        if isinstance(v, Config):
            return v
        if isinstance(v, dict):
            return Config(v)
        if isinstance(v, (list, tuple)):
            return type(v)(Config._wrap(x) for x in v)
        return v

    def __setitem__(self, k, v):
        super().__setitem__(k, Config._wrap(v))

    def __setattr__(self, k, v):
        self[k] = v

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __delattr__(self, k):
        del self[k]

    def __deepcopy__(self, memo):
        return Config({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def to_dict(self) -> Dict:
        out = {}
        for k, v in self.items():
            if isinstance(v, Config):
                out[k] = v.to_dict()
            else:
                out[k] = v
        return out


def deep_merge(base: Dict, override: Dict) -> Config:
    """Return a new Config = base with override recursively applied on top."""
    out = Config(copy.deepcopy(dict(base)))
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _json_default(o):
    try:
        import numpy as np
        if isinstance(o, np.generic):
            return o.item()
        if isinstance(o, np.ndarray):
            return o.tolist()
    except ImportError:
        pass
    return repr(o)


def compile_config(
    cfg: Dict,
    default_policy_config: Optional[Dict] = None,
    seed: int = 0,
    save_cfg: bool = True,
) -> Config:
    """Merge user cfg over the policy default config and stamp the exp dir.

    Equivalent role to ding ``compile_config`` (lzero/entry/train_muzero.py:71):
    the merged tree is dumped to ``<exp_name>/total_config.json`` so an
    experiment is fully reproducible from its directory.
    """
    cfg = Config(copy.deepcopy(dict(cfg)))
    if default_policy_config is not None:
        cfg.policy = deep_merge(default_policy_config, cfg.get("policy", {}))
    cfg.seed = seed
    exp_name = cfg.get("exp_name", f"exp_{time.strftime('%y%m%d_%H%M%S')}")
    cfg.exp_name = exp_name
    if save_cfg:
        os.makedirs(exp_name, exist_ok=True)
        os.makedirs(os.path.join(exp_name, "ckpt"), exist_ok=True)
        os.makedirs(os.path.join(exp_name, "log"), exist_ok=True)
        with open(os.path.join(exp_name, "total_config.json"), "w") as f:
            json.dump(cfg.to_dict(), f, indent=2, default=_json_default)
    return cfg
