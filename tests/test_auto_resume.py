"""Crashed-run auto-resume (SURVEY §5.3): rerunning the same config with
auto_resume restores the last periodic checkpoint + counters instead of
restarting from scratch."""
import copy
import json
import os

import pytest

from lightzero_tpu.config import Config

pytestmark = [pytest.mark.unittest, pytest.mark.slow]


def _cfg(exp):
    return Config(dict(
        exp_name=exp,
        env=dict(type="cartpole", stop_value=10**9, collector_env_num=2,
                 evaluator_env_num=2),
        policy=dict(
            type="muzero",
            model=dict(observation_shape=4, action_space_size=2,
                       model_type="mlp", latent_state_dim=16),
            num_simulations=4, batch_size=8, update_per_collect=2,
            n_episode=2, eval_freq=10**9, save_ckpt_freq=2,
            auto_resume=True,
        ),
    ))


def test_auto_resume_continues_counters(tmp_path):
    from lightzero_tpu.entry import train_muzero

    exp = os.path.join(str(tmp_path), "exp")
    _, _, r1 = train_muzero(_cfg(exp), seed=0, max_train_iter=4)
    meta_path = os.path.join(exp, "ckpt", "resume_meta.json")
    assert os.path.exists(meta_path), "periodic save must write the resume sidecar"
    with open(meta_path) as f:
        meta = json.load(f)
    assert meta["train_iter"] > 0
    assert meta["env_steps"] > 0
    assert os.path.isdir(os.path.join(exp, "ckpt", meta["last_ckpt"]))

    # "crash" and rerun the same config: must pick up where it left off
    _, _, r2 = train_muzero(_cfg(exp), seed=0, max_train_iter=8)
    assert r2["train_iter"] >= r1["train_iter"], "resume must not restart iter at 0"
    assert r2["env_steps"] > meta["env_steps"], "env-step counter must carry over"
    log_path = os.path.join(exp, "log", "train.txt")
    log = open(log_path).read() if os.path.exists(log_path) else ""
    if log:
        assert "auto_resume: restored" in log
