"""Offline checkpoint-sweep evaluation (reference eval_offline,
lzero/entry/train_muzero.py:220-233): evaluate every saved
``iteration_*`` checkpoint in an experiment dir and report the best."""
from __future__ import annotations

import os
import re
from typing import Dict, List, Optional

import jax

from lightzero_tpu.config import Config, compile_config
from lightzero_tpu.utils import POLICY_REGISTRY
from lightzero_tpu.utils.checkpoint import load_checkpoint


def eval_offline(cfg, exp_dir: Optional[str] = None, seed: int = 0, n_episodes: int = 5) -> Dict:
    import lightzero_tpu.entry  # noqa: F401  (registries)
    from lightzero_tpu.entry.train_muzero import create_env
    from lightzero_tpu.workers import Evaluator

    if isinstance(cfg, (list, tuple)):
        cfg = cfg[0]
    policy_type = Config(cfg).get("policy", {}).get("type", "muzero")
    policy_cls = POLICY_REGISTRY.get(policy_type)
    cfg = compile_config(cfg, policy_cls.default_config(), seed, save_cfg=False)
    exp_dir = exp_dir or cfg.exp_name
    ckpt_dir = os.path.join(exp_dir, "ckpt")
    ckpts: List[str] = []
    for name in sorted(os.listdir(ckpt_dir)):
        if re.match(r"iteration_\d+", name) or name in ("ckpt_best", "ckpt_final"):
            ckpts.append(os.path.join(ckpt_dir, name))
    assert ckpts, f"no checkpoints under {ckpt_dir}"

    env = create_env(cfg.env)
    policy = policy_cls(cfg.policy)
    state = policy.init_train_state(jax.random.PRNGKey(seed))
    evaluator = Evaluator(env, policy, cfg.env.get("evaluator_env_num", 3))
    results = {}
    for path in ckpts:
        st = load_checkpoint(path, target=state)
        res = evaluator.eval(st.params, n_episodes=n_episodes)
        results[os.path.basename(path)] = res["mean_return"]
    best = max(results, key=results.get)
    return dict(results=results, best_ckpt=best, best_return=results[best])
