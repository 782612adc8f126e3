"""Multitask MuZero training (reference
lzero/entry/train_muzero_multitask_segment_ddp.py / train_unizero_multitask_*):
ONE shared policy trained across several tasks, each with its own envs,
collector, and buffer.

TPU-native redesign of the reference's rank→task partition + manual NCCL
all-reduce (SURVEY.md §3.6): on one host, per-task batches are concatenated
with per-sample task weights folded into the IS weights and trained in ONE
jitted step; scaling out means sharding that combined batch over the 'dp'
mesh axis (lightzero_tpu.parallel.dp_train_step) — the gradient reduction
compiles onto ICI, no torch.distributed plumbing.

Task weighting follows the reference's symlog-normalized distance-to-target
(compute_task_weights, lzero/entry/utils.py:195).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

import jax

from lightzero_tpu.utils.jax_setup import setup_jax

setup_jax()
import jax.numpy as jnp

import lightzero_tpu.envs  # noqa: F401
from lightzero_tpu.buffers import GameBuffer
from lightzero_tpu.config import Config, compile_config
from lightzero_tpu.entry.train_muzero import create_env
from lightzero_tpu.ops import visit_count_temperature
from lightzero_tpu.policy.muzero import TrainBatch
from lightzero_tpu.utils import POLICY_REGISTRY
from lightzero_tpu.utils.benchmark_scores import normalized_stats
from lightzero_tpu.utils.checkpoint import save_checkpoint
from lightzero_tpu.utils.logger import ExperimentLogger
from lightzero_tpu.workers import Evaluator, RolloutCollector


def compute_task_weights(returns: Dict[int, float], targets: Dict[int, float],
                         temperature: float = 1.0) -> Dict[int, float]:
    """Symlog-normalized distance-to-target weighting (entry/utils.py:195):
    harder (further-from-target) tasks get more weight; mean weight = 1."""
    dists = {}
    for t, r in returns.items():
        d = max(targets.get(t, 1.0) - r, 0.0)
        dists[t] = np.log1p(d)  # symlog of the nonneg distance
    vals = np.asarray(list(dists.values()), np.float64)
    if vals.sum() <= 0:
        return {t: 1.0 for t in returns}
    w = np.exp(vals / temperature)
    w = w / w.mean()
    return {t: float(w[i]) for i, t in enumerate(dists)}


def train_muzero_multitask(
    cfgs: List[Config],
    seed: int = 0,
    max_env_step: int = int(1e6),
    max_train_iter: int = int(1e9),
):
    """``cfgs``: one config per task; cfgs[0].policy defines the SHARED
    policy (all tasks must share obs/action spaces, like the reference's
    padded multitask Atari setting)."""
    cfgs = [Config(dict(c)) for c in cfgs]
    policy_type = cfgs[0].get("policy", {}).get("type", "muzero")
    policy_cls = POLICY_REGISTRY.get(policy_type)
    cfg0 = compile_config(cfgs[0], policy_cls.default_config(), seed)
    pcfg = cfg0.policy
    num_tasks = len(cfgs)

    if "task_num" in pcfg:
        pcfg.task_num = num_tasks

    # multi-host: static task->process partition + cross-host return sync
    # (reference tasks_per_rank + all_gather_object/broadcast,
    # train_unizero_multitask_segment_ddp.py:130-154,388-451). One process
    # == the full task list; the code path is identical.
    from lightzero_tpu.parallel.distributed import (
        all_gather_scalars,
        init_distributed,
        partition_tasks,
    )

    init_distributed()
    local_tasks = list(partition_tasks(num_tasks))

    rng = jax.random.PRNGKey(seed)
    policy = policy_cls(pcfg)
    rng, init_rng = jax.random.split(rng)
    state = policy.init_train_state(init_rng)
    is_mt = hasattr(policy, "task_view")
    task_policies = [policy.task_view(t) if is_mt else policy for t in range(num_tasks)]

    collectors, evaluators, buffers, stop_values = {}, {}, {}, {}
    for ti in local_tasks:
        c = cfgs[ti]
        env = create_env(c.env)
        assert env is not None, "multitask entry currently requires pure-JAX envs"
        rng, c_rng, e_rng = jax.random.split(rng, 3)
        collectors[ti] = RolloutCollector(
            env, task_policies[ti], c.env.get("collector_env_num", 4), rng=c_rng
        )
        evaluators[ti] = Evaluator(
            env, task_policies[ti], c.env.get("evaluator_env_num", 2), rng=e_rng
        )
        buffers[ti] = GameBuffer(pcfg, task_policies[ti])
    for ti, c in enumerate(cfgs):
        stop_values[ti] = float(c.env.get("stop_value", 1e9))

    logger = ExperimentLogger(cfg0.exp_name, "train")
    batch_size = int(pcfg.batch_size)
    per_task_bs = max(1, batch_size // num_tasks)
    n_episode = int(pcfg.get("n_episode", 4))
    upc = int(pcfg.get("update_per_collect", 50))
    eval_freq = int(pcfg.get("eval_freq", 100))
    train_iter = 0
    last_eval = -eval_freq - 1
    task_returns: Dict[int, float] = {t: 0.0 for t in range(num_tasks)}

    def total_env_steps():
        return sum(c.total_env_steps for c in collectors.values())

    while total_env_steps() < max_env_step and train_iter < max_train_iter:
        temperature = visit_count_temperature(
            pcfg.get("manual_temperature_decay", False),
            pcfg.get("fixed_temperature_value", 1.0),
            pcfg.get("threshold_training_steps_for_final_temperature", int(1e5)),
            train_iter,
        )
        if train_iter - last_eval >= eval_freq:
            last_eval = train_iter
            for ti, ev in evaluators.items():
                res = ev.eval(state.params)
                task_returns[ti] = res["mean_return"]
                logger.info(f"iter={train_iter} task{ti} EVAL return={res['mean_return']:.1f}")
            # every process sees every task's latest return (reference
            # all_gather_object of task_returns, :388-418). The gathered key
            # set must be identical across processes: every process reports
            # ALL tasks, NaN for tasks it does not own.
            gathered = all_gather_scalars({
                f"task{t}": (task_returns[t] if t in local_tasks else float("nan"))
                for t in range(num_tasks)
            })
            for t in range(num_tasks):
                vals = gathered[f"task{t}"]
                if t not in local_tasks and np.any(np.isfinite(vals)):
                    task_returns[t] = float(np.nanmax(vals))
            # human-normalized mean/median over the suite when task names
            # resolve to a known benchmark table (reference UniZero-MT
            # scaffolding, train_unizero_multitask_segment_ddp.py:77-100)
            hn_mean, hn_median = normalized_stats({
                str(cfgs[t].env.get("task_name", cfgs[t].env.get("type", t))):
                    task_returns.get(t)
                for t in range(num_tasks)
            }, benchmark=str(cfg0.policy.get("benchmark_name", "atari")))
            if hn_mean is not None:
                logger.info(
                    f"iter={train_iter} human_norm mean={hn_mean:.3f} "
                    f"median={hn_median:.3f}"
                )
        for ti, coll in collectors.items():
            episodes, priorities, _ = coll.collect(
                state.params, temperature=temperature, num_episodes=n_episode
            )
            buffers[ti].push_episodes(episodes, priorities)
        if any(b.num_transitions < per_task_bs for b in buffers.values()):
            continue
        # symlog task weights from distance-to-target — deterministic given
        # the synced returns, so every process computes identical weights
        # (the reference's rank0 compute + broadcast, :440-451)
        weights = compute_task_weights(task_returns, {t: v for t, v in stop_values.items()})
        task_weight_arr = np.asarray(
            [weights.get(t, 1.0) for t in range(num_tasks)], np.float32
        )
        order = sorted(buffers)
        for _ in range(upc):
            parts, idxs = [], []
            for ti in order:
                batch, idx = buffers[ti].sample(per_task_bs, state.target_params)
                if not is_mt:
                    batch = batch._replace(weights=batch.weights * weights.get(ti, 1.0))
                parts.append(batch)
                idxs.append(idx)
            combined = jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs, axis=0), *parts)
            if is_mt:
                from lightzero_tpu.policy.multitask import attach_task_fields

                task_id = np.repeat(np.asarray(order, np.int32), per_task_bs)
                combined = attach_task_fields(combined, task_id, task_weight_arr)
            state, logs, priority = policy.forward_learn(state, combined)
            priority = np.asarray(priority)
            for j, ti in enumerate(order):
                buffers[ti].update_priority(
                    idxs[j], priority[j * per_task_bs : (j + 1) * per_task_bs]
                )
            train_iter += 1
        logger.info(
            f"iter={train_iter} envsteps={total_env_steps()} "
            f"loss={float(logs.get('total_loss', 0)):.3f} weights={weights}"
        )
    save_checkpoint(state, os.path.join(cfg0.exp_name, "ckpt", "ckpt_final"))
    logger.close()
    return policy, state, dict(env_steps=total_env_steps(), train_iter=train_iter,
                               task_returns=task_returns)
