"""Curriculum/balance multitask training (reference
lzero/entry/train_unizero_multitask_balance_segment_ddp.py:416-460).

On top of the plain multitask entry (shared policy, per-task envs/buffers,
symlog task weights) this adds the BALANCE pipeline:

- a solved-task pool: a task whose eval return reaches its
  ``solved_threshold`` stops collecting (it re-evaluates periodically and
  rejoins if it regresses), so compute concentrates on unsolved tasks;
- curriculum stages: when at least ``stage_solved_frac`` of tasks are
  solved, the CurriculumLoRA stage advances
  (policy.set_curriculum_stage) — the world-model transformer backbone
  freezes and per-stage LoRA adapters take over
  (CurriculumLoRADense, models/unizero_world_model/transformer.py), exactly
  the reference's stage-switch semantics (transformer.py:129-219).

The reference partitions tasks across DDP ranks and all-gathers solved
pools (train_unizero_multitask_balance_segment_ddp.py:416-460); here all
tasks live on one host and scale-out shards the combined batch over the
'dp' mesh axis (lightzero_tpu.parallel).
"""
from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

import jax

from lightzero_tpu.utils.jax_setup import setup_jax

setup_jax()
import jax.numpy as jnp

import lightzero_tpu.envs  # noqa: F401
from lightzero_tpu.buffers import GameBuffer
from lightzero_tpu.config import Config, compile_config
from lightzero_tpu.entry.train_muzero import create_env
from lightzero_tpu.entry.train_muzero_multitask import compute_task_weights
from lightzero_tpu.utils.benchmark_scores import normalized_stats
from lightzero_tpu.ops import visit_count_temperature
from lightzero_tpu.utils import POLICY_REGISTRY
from lightzero_tpu.utils.checkpoint import (
    load_checkpoint,
    save_checkpoint,
    save_params_export,
)
from lightzero_tpu.utils.logger import ExperimentLogger
from lightzero_tpu.workers import Evaluator, RolloutCollector


def train_multitask_balance(
    cfgs: List[Config],
    seed: int = 0,
    max_env_step: int = int(1e6),
    max_train_iter: int = int(1e9),
):
    """``cfgs``: one per task. cfgs[0].policy defines the shared policy.
    Per-task ``env.solved_threshold`` (default: env.stop_value) gates the
    solved pool; ``policy.stage_solved_frac`` (default 0.5) gates stage
    advances when curriculum LoRA is enabled."""
    cfgs = [Config(dict(c)) for c in cfgs]
    policy_type = cfgs[0].get("policy", {}).get("type", "unizero")
    policy_cls = POLICY_REGISTRY.get(policy_type)
    cfg0 = compile_config(cfgs[0], policy_cls.default_config(), seed)
    pcfg = cfg0.policy
    num_tasks = len(cfgs)

    if "task_num" in pcfg:
        pcfg.task_num = num_tasks

    rng = jax.random.PRNGKey(seed)
    policy = policy_cls(pcfg)
    rng, init_rng = jax.random.split(rng)
    state = policy.init_train_state(init_rng)
    # multitask policy types bind a static task id per worker so the world
    # model's task embedding conditions collect/eval/reanalyze
    is_mt = hasattr(policy, "task_view")
    task_policies = [policy.task_view(t) if is_mt else policy for t in range(num_tasks)]

    def build_workers():
        nonlocal rng, task_policies
        if is_mt:
            task_policies = [policy.task_view(t) for t in range(num_tasks)]
        colls, evs = [], []
        for ti, c in enumerate(cfgs):
            env = create_env(c.env)
            assert env is not None, "balance entry currently requires pure-JAX envs"
            if c.env.get("pad_obs_to"):
                from lightzero_tpu.envs.wrappers import PadVectorObs

                env = PadVectorObs(env, int(c.env.pad_obs_to))
            rng, c_rng, e_rng = jax.random.split(rng, 3)
            colls.append(
                RolloutCollector(
                    env, task_policies[ti], c.env.get("collector_env_num", 4), rng=c_rng
                )
            )
            evs.append(
                Evaluator(env, task_policies[ti], c.env.get("evaluator_env_num", 2), rng=e_rng)
            )
        return colls, evs

    collectors, evaluators = build_workers()
    buffers = [GameBuffer(pcfg, task_policies[t]) for t in range(num_tasks)]
    solved_thresholds = [
        float(c.env.get("solved_threshold", c.env.get("stop_value", 1e9))) for c in cfgs
    ]
    stop_values = [float(c.env.get("stop_value", 1e9)) for c in cfgs]

    logger = ExperimentLogger(cfg0.exp_name, "train")
    batch_size = int(pcfg.batch_size)
    per_task_bs = max(1, batch_size // num_tasks)
    n_episode = int(pcfg.get("n_episode", 4))
    upc = int(pcfg.get("update_per_collect", 50))
    eval_freq = int(pcfg.get("eval_freq", 100))
    stage_solved_frac = float(pcfg.get("stage_solved_frac", 0.5))
    max_stage = int(pcfg.model.get("curriculum_stage_num", 1)) - 1
    lora_on = int(pcfg.model.get("lora_r", 0)) > 0 and max_stage > 0

    train_iter = 0
    env_step_base = 0
    last_eval = -eval_freq - 1
    best_mean_return = -float("inf")
    stage = int(pcfg.model.get("curriculum_stage", 0))
    solved: Dict[int, bool] = {t: False for t in range(num_tasks)}
    task_returns: Dict[int, float] = {t: -1e9 for t in range(num_tasks)}
    # crashed/trimmed-run auto-resume (same sidecar protocol as
    # train_muzero, SURVEY §5.3): restore params + counters; buffers are
    # rebuilt from fresh self-play with the restored (strong) params
    meta_path = os.path.join(cfg0.exp_name, "ckpt", "resume_meta.json")
    if pcfg.get("auto_resume", False) and os.path.exists(meta_path):
        import json

        with open(meta_path) as f:
            meta = json.load(f)
        ckpt = os.path.join(cfg0.exp_name, "ckpt", str(meta["last_ckpt"]))
        if os.path.isdir(ckpt):
            state = load_checkpoint(ckpt, target=state)
            train_iter = int(meta["train_iter"])
            env_step_base = int(meta["env_steps"])
            stage = int(meta.get("stage", stage))
            if stage > 0 and lora_on:
                policy.set_curriculum_stage(stage)
                state = state._replace(opt_state=policy.optimizer.init(state.params))
                collectors, evaluators = build_workers()
            logger.info(
                f"auto_resume: restored {meta['last_ckpt']} (iter={train_iter} "
                f"envstep={env_step_base} stage={stage})"
            )
    # debounce: a task counts as solved only after ``solved_patience``
    # CONSECUTIVE above-threshold evals — with few-episode evaluators a
    # single lucky eval would otherwise freeze the trunk (stage switch)
    # before the tasks have actually been learned
    solved_patience = int(pcfg.get("solved_patience", 2))
    solved_streak: Dict[int, int] = {t: 0 for t in range(num_tasks)}

    def total_env_steps():
        return env_step_base + sum(c.total_env_steps for c in collectors)

    while total_env_steps() < max_env_step and train_iter < max_train_iter:
        temperature = visit_count_temperature(
            pcfg.get("manual_temperature_decay", False),
            pcfg.get("fixed_temperature_value", 1.0),
            pcfg.get("threshold_training_steps_for_final_temperature", int(1e5)),
            train_iter,
        )
        if train_iter - last_eval >= eval_freq:
            last_eval = train_iter
            for ti, ev in enumerate(evaluators):
                res = ev.eval(state.params)
                task_returns[ti] = res["mean_return"]
                was = solved[ti]
                if res["mean_return"] >= solved_thresholds[ti]:
                    solved_streak[ti] += 1
                else:
                    solved_streak[ti] = 0
                solved[ti] = solved_streak[ti] >= solved_patience
                if solved[ti] != was:
                    logger.info(
                        f"task{ti} {'SOLVED' if solved[ti] else 'regressed'} "
                        f"(return={res['mean_return']:.1f})"
                    )
            logger.log_scalars(
                {f"task{ti}/eval_mean_return": task_returns[ti] for ti in range(num_tasks)},
                total_env_steps(),
                prefix="evaluator/",
            )
            logger.info(
                "EVAL " + " ".join(f"task{ti}={task_returns[ti]:.1f}" for ti in range(num_tasks))
            )
            # best-checkpoint tracking on the cross-task mean (round-4
            # verdict: the v2 suite's "solved" claim could not be re-verified
            # because no checkpoint was ever saved) — full ckpt_best for
            # resume + durable params_best export for re-eval
            cur_mean = sum(task_returns.values()) / num_tasks
            if cur_mean > best_mean_return and all(
                r > -1e8 for r in task_returns.values()
            ):
                best_mean_return = cur_mean
                save_checkpoint(state, os.path.join(cfg0.exp_name, "ckpt", "ckpt_best"))
                save_params_export(
                    state, os.path.join(cfg0.exp_name, "ckpt", "params_best")
                )
                logger.info(f"new best mean return {cur_mean:.1f} -> ckpt_best")
            # human-normalized mean/median when task names resolve to a
            # benchmark table (reference UniZero-MT scaffolding)
            hn_mean, hn_median = normalized_stats({
                str(cfgs[ti].env.get("task_name", cfgs[ti].env.get("type", ti))):
                    (None if task_returns[ti] <= -1e8 else task_returns[ti])
                for ti in range(num_tasks)
            }, benchmark=str(cfg0.policy.get("benchmark_name", "atari")))
            if hn_mean is not None:
                logger.info(
                    f"human_norm mean={hn_mean:.3f} median={hn_median:.3f}"
                )
            # curriculum stage advance (balance entry :416-460)
            frac = sum(solved.values()) / num_tasks
            if lora_on and stage < max_stage and frac >= stage_solved_frac:
                stage += 1
                logger.info(f"curriculum stage -> {stage} (solved frac {frac:.2f})")
                policy.set_curriculum_stage(stage)
                # param structure is unchanged; the masked optimizer needs a
                # fresh state, and the workers' jit closures a fresh model
                state = state._replace(opt_state=policy.optimizer.init(state.params))
                collectors, evaluators = build_workers()

        for ti, coll in enumerate(collectors):
            if solved[ti]:
                continue  # solved pool: no more collection budget
            episodes, priorities, _ = coll.collect(
                state.params, temperature=temperature, num_episodes=n_episode
            )
            buffers[ti].push_episodes(episodes, priorities)
        active = [t for t in range(num_tasks) if buffers[t].num_transitions >= per_task_bs]
        if not active:
            continue
        weights = compute_task_weights(
            {t: task_returns[t] for t in active},
            {t: stop_values[t] for t in active},
        )
        task_weight_arr = np.asarray(
            [weights.get(t, 1.0) for t in range(num_tasks)], np.float32
        )
        for _ in range(upc):
            parts, idxs, order = [], [], []
            for ti in active:
                batch, idx = buffers[ti].sample(per_task_bs, state.target_params)
                if not is_mt:
                    # plain policies: task weight folded into the IS weights
                    batch = batch._replace(weights=batch.weights * weights.get(ti, 1.0))
                idxs.append(idx)
                parts.append(batch)
                order.append(ti)
            combined = jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs, axis=0), *parts)
            if is_mt:
                # per-task aggregation + task weights INSIDE the jitted step
                # (policy/multitask.py; reference sampled_unizero_multitask
                # .py:451-453)
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
            f"iter={train_iter} envsteps={total_env_steps()} stage={stage} "
            f"solved={[t for t, s in solved.items() if s]} "
            f"loss={float(logs.get('total_loss', 0)):.3f}"
        )
        if train_iter % int(pcfg.get("save_ckpt_freq", 10_000)) < upc:
            import json

            name = f"iteration_{train_iter}"
            save_checkpoint(state, os.path.join(cfg0.exp_name, "ckpt", name))
            with open(meta_path, "w") as f:
                json.dump(dict(last_ckpt=name, train_iter=train_iter,
                               env_steps=int(total_env_steps()), stage=stage), f)
        if all(solved.values()):
            logger.info("all tasks solved — stopping")
            break
    save_checkpoint(state, os.path.join(cfg0.exp_name, "ckpt", "ckpt_final"))
    logger.close()
    return policy, state, dict(
        env_steps=total_env_steps(),
        train_iter=train_iter,
        task_returns=task_returns,
        stage=stage,
        solved=solved,
    )
