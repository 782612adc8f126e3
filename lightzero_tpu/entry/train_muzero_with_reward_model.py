"""MuZero + RND intrinsic reward entry (reference
lzero/entry/train_muzero_with_reward_model.py: reward_model.collect_data +
train_with_data each loop, estimate fused into collected rewards
:158-166). Here the intrinsic bonus is applied to episode rewards before
they enter the buffer, so every downstream target sees the shaped reward."""
from __future__ import annotations

from typing import Optional

import numpy as np

import jax

from lightzero_tpu.utils.jax_setup import setup_jax

setup_jax()

from lightzero_tpu.config import Config
from lightzero_tpu.reward_model import RNDRewardModel


def train_muzero_with_reward_model(
    cfg,
    seed: int = 0,
    model_path: Optional[str] = None,
    max_env_step: int = int(1e6),
    max_train_iter: int = int(1e9),
):
    """Wraps train_muzero's loop with an RND model: simplest composition is
    a collector post-hook. We reuse train_muzero by monkey-wrapping the
    buffer push via a shim subclass of GameBuffer? — instead, run the loop
    here explicitly (mirrors the reference having a separate entry)."""
    from lightzero_tpu.buffers import GameBuffer
    from lightzero_tpu.config import compile_config
    from lightzero_tpu.entry.train_muzero import create_env
    from lightzero_tpu.ops import visit_count_temperature
    from lightzero_tpu.utils import POLICY_REGISTRY
    from lightzero_tpu.utils.checkpoint import save_checkpoint
    from lightzero_tpu.utils.logger import ExperimentLogger
    from lightzero_tpu.workers import Evaluator, RolloutCollector
    import os

    if isinstance(cfg, (list, tuple)):
        cfg = cfg[0]
    policy_type = Config(cfg).get("policy", {}).get("type", "muzero")
    policy_cls = POLICY_REGISTRY.get(policy_type)
    cfg = compile_config(cfg, policy_cls.default_config(), seed)
    pcfg = cfg.policy
    rng = jax.random.PRNGKey(seed)
    env = create_env(cfg.env)
    policy = policy_cls(pcfg)
    rng, init_rng, rnd_rng = jax.random.split(rng, 3)
    state = policy.init_train_state(init_rng)

    obs_dim = int(np.prod(np.atleast_1d(pcfg.model.observation_shape)))
    rnd = RNDRewardModel(
        obs_dim,
        intrinsic_reward_weight=float(pcfg.get("intrinsic_reward_weight", 0.01)),
    )
    rnd_state = rnd.init_state(rnd_rng)

    buffer = GameBuffer(pcfg, policy)
    rng, c_rng, e_rng = jax.random.split(rng, 3)
    collector = RolloutCollector(env, policy, cfg.env.get("collector_env_num", 8), rng=c_rng)
    evaluator = Evaluator(env, policy, cfg.env.get("evaluator_env_num", 3), rng=e_rng)
    logger = ExperimentLogger(cfg.exp_name, "train")
    batch_size = int(pcfg.batch_size)
    train_iter = 0
    eval_freq = int(pcfg.get("eval_freq", 100))
    last_eval = -eval_freq - 1

    while collector.total_env_steps < max_env_step and train_iter < max_train_iter:
        temperature = visit_count_temperature(
            pcfg.get("manual_temperature_decay", False),
            pcfg.get("fixed_temperature_value", 1.0),
            pcfg.get("threshold_training_steps_for_final_temperature", int(1e5)),
            train_iter,
        )
        if train_iter - last_eval >= eval_freq:
            last_eval = train_iter
            res = evaluator.eval(state.params)
            logger.info(f"iter={train_iter} EVAL mean_return={res['mean_return']:.1f}")
            if res["mean_return"] >= cfg.env.get("stop_value", float("inf")):
                break
        episodes, priorities, cstats = collector.collect(
            state.params, temperature=temperature, num_episodes=int(pcfg.get("n_episode", 8))
        )
        # train RND on fresh obs + shape episode rewards with intrinsic bonus
        shaped = []
        for ep in episodes:
            flat_obs = ep.obs.reshape(len(ep.obs), -1)
            rnd_state, _ = rnd.train(rnd_state, flat_obs)
            rnd_state, new_rewards, _ = rnd.estimate(rnd_state, flat_obs, ep.rewards)
            shaped.append(ep._replace(rewards=np.asarray(new_rewards, np.float32)))
        buffer.push_episodes(shaped, priorities)
        if buffer.num_transitions < batch_size:
            continue
        upc = int(pcfg.get("update_per_collect") or max(1, int(cstats["steps"] * 0.25)))
        for _ in range(upc):
            batch, idx = buffer.sample(batch_size, state.target_params)
            state, logs, priority = policy.forward_learn(state, batch)
            buffer.update_priority(idx, np.asarray(priority))
            train_iter += 1
        logger.info(
            f"iter={train_iter} envstep={collector.total_env_steps} "
            f"loss={float(logs.get('total_loss', 0)):.3f}"
        )
    save_checkpoint(state, os.path.join(cfg.exp_name, "ckpt", "ckpt_final"))
    logger.close()
    return policy, state, dict(env_steps=collector.total_env_steps, train_iter=train_iter)
