"""The canonical MuZero training entry (reference
lzero/entry/train_muzero.py:24 — see SURVEY.md §3.1 call stack), rebuilt
around jitted collection/search/training.

Loop: [eval every eval_freq] → collect n_episode episodes → push to buffer →
update_per_collect gradient steps (priority-resampled each step) → repeat
until max_env_step or stop_value reached.
"""
from __future__ import annotations

import json
import os
import time
from typing import List, Optional

import numpy as np

import jax

from lightzero_tpu.utils.jax_setup import setup_jax

setup_jax()

from lightzero_tpu.buffers import GameBuffer
from lightzero_tpu.config import Config, compile_config
from lightzero_tpu.ops import visit_count_temperature
import lightzero_tpu.envs  # noqa: F401  (populates ENV_REGISTRY)
from lightzero_tpu.policy import MuZeroPolicy
from lightzero_tpu.policy.efficientzero import EfficientZeroPolicy  # noqa: F401
from lightzero_tpu.policy.gumbel_muzero import GumbelMuZeroPolicy  # noqa: F401
from lightzero_tpu.policy.stochastic_muzero import StochasticMuZeroPolicy  # noqa: F401
from lightzero_tpu.policy.sampled_muzero import SampledMuZeroPolicy  # noqa: F401
from lightzero_tpu.policy.unizero import UniZeroPolicy  # noqa: F401
from lightzero_tpu.policy.sampled_efficientzero import SampledEfficientZeroPolicy  # noqa: F401
from lightzero_tpu.policy.sampled_unizero import SampledUniZeroPolicy  # noqa: F401
from lightzero_tpu.policy.muzero_rnn_full_obs import MuZeroRNNFullObsPolicy  # noqa: F401
from lightzero_tpu.policy.muzero_context import MuZeroContextPolicy  # noqa: F401
from lightzero_tpu.policy.multitask import (  # noqa: F401
    MuZeroMTPolicy,
    SampledUniZeroMTPolicy,
    UniZeroMTPolicy,
)
from lightzero_tpu.utils import ENV_REGISTRY, POLICY_REGISTRY
from lightzero_tpu.utils.checkpoint import (
    load_checkpoint,
    load_checkpoint_lenient,
    save_checkpoint,
    save_params_export,
)
from lightzero_tpu.utils.logger import ExperimentLogger
from lightzero_tpu.workers import Evaluator, RolloutCollector

# env_id aliases (reference uses gym ids in configs)
ENV_ALIASES = {
    "CartPole-v0": ("cartpole", {}),
    "CartPole-v1": ("cartpole", {"max_episode_steps": 500}),
    "Pendulum-v1": ("pendulum", {}),
}


def create_env(env_cfg: Config):
    """Pure-JAX env from the registry, or None for host (gymnasium) envs."""
    env_id = env_cfg.get("env_id", env_cfg.get("type"))
    if env_id in ENV_ALIASES:
        key, kwargs = ENV_ALIASES[env_id]
    elif env_id in ENV_REGISTRY:
        key, kwargs = env_id, {}
    else:
        return None  # fall back to gymnasium host env
    kwargs = dict(kwargs)
    # forward top-level env-config keys that match the env constructor
    # (battle_mode, board_size, komi, ...) — the reference's env configs put
    # these at the env level, not nested; dropping them silently changed
    # play_with_bot_mode into self_play_mode for board games
    import inspect

    sig = inspect.signature(ENV_REGISTRY.get(key).__init__)
    for k, v in dict(env_cfg).items():
        if k in sig.parameters and k != "self":
            kwargs[k] = v
    kwargs.update(env_cfg.get("env_kwargs", {}))
    return ENV_REGISTRY.build(key, **kwargs)


def make_host_vec_env(env_cfg: Config, num_envs: int, seed: int):
    """Dispatch a host (non-jittable) env family to its eager vec adapter:
    ALE ids -> AtariVecEnv, MiniGrid-* -> MiniGridVecEnv, jericho ->
    JerichoVecEnv, dmc2gym -> DMC2GymVecEnv, metadrive -> MetaDriveVecEnv,
    pooltool/sum_to_three -> SumToThreeVecEnv, anything else -> gymnasium
    HostVecEnv (box2d/mujoco ids like LunarLander-v2 / Hopper-v4)."""
    env_id = str(env_cfg.get("env_id", env_cfg.get("type", "")))
    kwargs = dict(env_cfg.get("env_kwargs", {}))
    if env_id.startswith("ALE/"):
        from lightzero_tpu.envs.atari import AtariVecEnv

        return AtariVecEnv(env_id, num_envs, seed=seed, env_kwargs=kwargs or None)
    if env_id.startswith("MiniGrid-") or env_id == "minigrid":
        from lightzero_tpu.envs.minigrid_env import MiniGridVecEnv

        mg_id = kwargs.pop("env_id", env_id if env_id != "minigrid" else "MiniGrid-Empty-8x8-v0")
        return MiniGridVecEnv(mg_id, num_envs, seed=seed, **kwargs)
    if env_id == "jericho":
        from lightzero_tpu.envs.jericho_env import JerichoVecEnv

        return JerichoVecEnv(num_envs=num_envs, seed=seed, **kwargs)
    if env_id == "dmc2gym":
        from lightzero_tpu.envs.dmc2gym_env import DMC2GymVecEnv

        return DMC2GymVecEnv(num_envs=num_envs, seed=seed, **kwargs)
    if env_id == "metadrive":
        from lightzero_tpu.envs.metadrive_env import MetaDriveVecEnv

        return MetaDriveVecEnv(num_envs=num_envs, seed=seed, **kwargs)
    if env_id in ("pooltool", "sum_to_three"):
        from lightzero_tpu.envs.pooltool_env import SumToThreeVecEnv

        return SumToThreeVecEnv(num_envs=num_envs, seed=seed, **kwargs)
    from lightzero_tpu.envs.host_env import HostVecEnv

    return HostVecEnv(env_id, num_envs, seed=seed, env_kwargs=kwargs or None)


def train_muzero(
    cfg,
    seed: int = 0,
    model_path: Optional[str] = None,
    max_env_step: int = int(1e6),
    max_train_iter: int = int(1e9),
):
    if isinstance(cfg, (list, tuple)):  # reference passes [main, create]
        cfg = cfg[0]
    # dispatch on cfg.policy.type (reference: ding create_policy registry,
    # train_muzero.py:94) — same entry serves muzero/efficientzero/...
    policy_type = Config(cfg).get("policy", {}).get("type", "muzero")
    policy_cls = POLICY_REGISTRY.get(policy_type)
    cfg = compile_config(cfg, policy_cls.default_config(), seed)
    pcfg = cfg.policy
    pcfg.seed = seed

    rng = jax.random.PRNGKey(seed)
    env = create_env(cfg.env)
    policy = policy_cls(pcfg)
    rng, init_rng = jax.random.split(rng)
    state = policy.init_train_state(init_rng)
    if model_path:
        state = load_checkpoint_lenient(model_path, target=state)

    buffer = GameBuffer(pcfg, policy)
    n_collect_envs = cfg.env.get("collector_env_num", 8)
    n_eval_envs = cfg.env.get("evaluator_env_num", 3)
    rng, c_rng, e_rng = jax.random.split(rng, 3)
    if env is not None:
        collector = RolloutCollector(env, policy, n_collect_envs, rng=c_rng)
        evaluator = Evaluator(env, policy, n_eval_envs, rng=e_rng)
    else:
        # host env path (box2d/mujoco/atari/minigrid/jericho/dmc/... —
        # reference subprocess env-manager territory)
        from lightzero_tpu.workers.host_collector import HostCollector, HostEvaluator

        collector = HostCollector(
            make_host_vec_env(cfg.env, n_collect_envs, seed), policy, rng=c_rng
        )
        evaluator = HostEvaluator(
            make_host_vec_env(cfg.env, n_eval_envs, seed + 777), policy, rng=e_rng
        )
    logger = ExperimentLogger(cfg.exp_name, "train")
    stop_value = cfg.env.get("stop_value", float("inf"))
    stop_streak = 0
    eval_freq = int(pcfg.get("eval_freq", 100))
    batch_size = int(pcfg.batch_size)
    n_episode = int(pcfg.get("n_episode", 8))
    update_per_collect = pcfg.get("update_per_collect", None)
    last_eval_iter = -eval_freq - 1

    train_iter = 0
    # crashed-run auto-resume (SURVEY §5.3): if a resume sidecar exists in
    # this exp dir and no explicit model_path was given, restore the last
    # periodic checkpoint AND the iteration/env-step counters so a rerun of
    # the same config continues instead of restarting. The replay buffer is
    # rebuilt from fresh self-play (params are strong, so this doubles as a
    # full-buffer refresh).
    if not model_path and pcfg.get("auto_resume", False):
        meta_path = os.path.join(cfg.exp_name, "ckpt", "resume_meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            ckpt = os.path.join(cfg.exp_name, "ckpt", str(meta["last_ckpt"]))
            if os.path.isdir(ckpt):
                state = load_checkpoint_lenient(ckpt, target=state)
                train_iter = int(meta["train_iter"])
                collector.total_env_steps = int(meta["env_steps"])
                logger.info(
                    f"auto_resume: restored {meta['last_ckpt']} "
                    f"(iter={train_iter} envstep={collector.total_env_steps})"
                )
    logger.info(
        f"train_muzero: exp={cfg.exp_name} max_env_step={max_env_step} "
        f"sims={pcfg.num_simulations} batch={batch_size}"
    )
    # warmup with random actions (reference random_collect, train_muzero.py:143-144)
    n_warmup = int(pcfg.get("random_collect_episode_num", 0))
    if n_warmup > 0:
        from lightzero_tpu.entry.utils import random_collect

        wstats = random_collect(collector, buffer, state.params, num_episodes=n_warmup)
        logger.info(f"random_collect: {wstats['episodes']} episodes, {wstats['steps']} steps")
    while collector.total_env_steps < max_env_step and train_iter < max_train_iter:
        temperature = visit_count_temperature(
            pcfg.get("manual_temperature_decay", False),
            pcfg.get("fixed_temperature_value", 0.25),
            pcfg.get("threshold_training_steps_for_final_temperature", int(1e5)),
            train_iter,
        )
        # ---- eval ----
        if train_iter - last_eval_iter >= eval_freq:
            last_eval_iter = train_iter
            from lightzero_tpu.entry.utils import safe_eval

            res = safe_eval(
                evaluator,
                state.params,
                n_episodes=cfg.env.get("n_evaluator_episode", n_eval_envs),
                timeout_s=float(pcfg.get("eval_timeout_s", 1800.0)),
            )
            if res is None:
                logger.info("safe_eval: evaluation timed out; continuing training")
                continue
            logger.log_scalars(
                {"eval_mean_return": res["mean_return"], "eval_max_return": res["max_return"]},
                collector.total_env_steps,
                prefix="evaluator/",
            )
            logger.info(
                f"iter={train_iter} envstep={collector.total_env_steps} "
                f"EVAL mean_return={res['mean_return']:.1f}"
            )
            if res["new_best"]:
                save_checkpoint(state, os.path.join(cfg.exp_name, "ckpt", "ckpt_best"))
                save_params_export(
                    state, os.path.join(cfg.exp_name, "ckpt", "params_best")
                )
            # stop only after N consecutive evals at/above stop_value: a
            # single 3-episode eval spike can be a fluke on high-variance
            # envs (pendulum random starts), and stopping on one froze
            # round-4's suz run at 9.7k steps with a -592 true mean
            if res["mean_return"] >= stop_value:
                stop_streak += 1
                if stop_streak >= int(pcfg.get("stop_consecutive_evals", 1)):
                    logger.info(f"stop_value {stop_value} reached; stopping.")
                    break
            else:
                stop_streak = 0
        # ---- collect ----
        # segment mode (reference train_muzero_segment.py /
        # muzero_segment_collector.py): num_segments x game_segment_length
        # steps per round, partial episodes flushed as truncated
        num_segments = pcfg.get("num_segments", None)
        if num_segments:
            episodes, priorities, cstats = collector.collect(
                state.params,
                temperature=temperature,
                epsilon=pcfg.get("collect_epsilon", 0.0),
                num_episodes=None,
                min_steps=int(num_segments) * int(pcfg.get("game_segment_length", 200)),
            )
        else:
            episodes, priorities, cstats = collector.collect(
                state.params,
                temperature=temperature,
                epsilon=pcfg.get("collect_epsilon", 0.0),
                num_episodes=n_episode,
            )
        buffer.push_episodes(episodes, priorities)
        # ReZero periodic whole-buffer reanalyze (train_rezero.py /
        # train_muzero_segment.py:191-208)
        br_freq = float(pcfg.get("buffer_reanalyze_freq", 0.0))
        if br_freq > 0:
            collect_round = getattr(collector, "total_episodes", 0) // max(n_episode, 1)
            every = max(1, int(round(1.0 / br_freq)))
            if collect_round % every == 0 and buffer.num_transitions > 0:
                rng, br_rng = jax.random.split(rng)
                n_re = buffer.reanalyze_buffer(
                    state.target_params,
                    br_rng,
                    reanalyze_batch_size=int(pcfg.get("reanalyze_batch_size", 256)),
                    partition=float(pcfg.get("reanalyze_partition", 0.75)),
                    reuse_search=bool(pcfg.get("reuse_search", False)),
                )
                logger.info(f"rezero: reanalyzed {n_re} transitions")
        logger.log_scalars(
            {
                "collect_mean_return": cstats["mean_return"],
                "steps_per_sec": cstats["steps_per_sec"],
                "buffer_transitions": buffer.num_transitions,
                "temperature": temperature,
                **{k: v for k, v in cstats.items()
                   if k in ("visit_mean_action", "collect_mu", "collect_sigma",
                            "visit_entropy", "searched_value")},
            },
            collector.total_env_steps,
            prefix="collector/",
        )
        # ---- train ----
        if update_per_collect is None:
            upc = max(1, int(cstats["steps"] * float(pcfg.get("replay_ratio", 0.25))))
        else:
            upc = int(update_per_collect)
        if buffer.num_transitions < batch_size:
            continue
        # reference train_start_after_envsteps (atari_unizero_config.py:79):
        # with replay_ratio-scaled update counts, training on a near-empty
        # buffer would burn hundreds of updates overfitting the first few
        # episodes
        if collector.total_env_steps < int(pcfg.get("train_start_after_envsteps", 0)):
            continue
        logs = {}
        for _ in range(upc):
            batch, idx = buffer.sample(batch_size, state.target_params)
            state, logs, priority = policy.forward_learn(state, batch)
            buffer.update_priority(idx, np.asarray(priority))
            train_iter += 1
        # numerical guard (reference asserts non-NaN losses, unizero.py:1027)
        _lv = float(logs.get("total_loss", 0.0)) if logs else 0.0
        if _lv != _lv or _lv in (float("inf"), float("-inf")):
            save_checkpoint(state, os.path.join(cfg.exp_name, "ckpt", "ckpt_nan"))
            raise RuntimeError(
                f"non-finite total_loss={_lv} at iter {train_iter} "
                f"(state saved to ckpt/ckpt_nan)"
            )
        logger.log_scalars(
            {k: v for k, v in logs.items()}, collector.total_env_steps, prefix="learner/"
        )
        logger.info(
            f"iter={train_iter} envstep={collector.total_env_steps} "
            f"loss={float(logs.get('total_loss', 0)):.3f} "
            f"collect_return={cstats['mean_return']:.1f} "
            f"sps={cstats['steps_per_sec']:.0f}"
        )
        if train_iter % int(pcfg.get("save_ckpt_freq", 10_000)) < upc:
            name = f"iteration_{train_iter}"
            save_checkpoint(state, os.path.join(cfg.exp_name, "ckpt", name))
            with open(os.path.join(cfg.exp_name, "ckpt", "resume_meta.json"), "w") as f:
                json.dump(dict(last_ckpt=name, train_iter=train_iter,
                               env_steps=int(collector.total_env_steps)), f)

    # post-training loss-landscape analysis (reference
    # train_unizero_with_loss_landscape's final phase)
    if pcfg.get("analysis_loss_landscape", False) and buffer.num_transitions >= batch_size:
        from lightzero_tpu.loss_landscape import loss_landscape_api

        batch, _ = buffer.sample(batch_size, state.target_params)
        res = loss_landscape_api(
            policy, state.params, batch,
            os.path.join(cfg.exp_name, "loss_landscape"),
            mode=str(pcfg.get("loss_landscape_mode", "1d")),
        )
        logger.info(f"loss_landscape: surface saved under {cfg.exp_name}/loss_landscape")
    save_checkpoint(state, os.path.join(cfg.exp_name, "ckpt", "ckpt_final"))
    logger.close()
    return policy, state, dict(
        env_steps=collector.total_env_steps,
        train_iter=train_iter,
        best_return=evaluator.best_return,
    )


def eval_muzero(cfg, seed: int = 0, model_path: Optional[str] = None, n_episodes: int = 5):
    """Load a checkpoint and run deterministic evaluation (reference
    lzero/entry/eval_muzero.py)."""
    if isinstance(cfg, (list, tuple)):
        cfg = cfg[0]
    policy_type = Config(cfg).get("policy", {}).get("type", "muzero")
    policy_cls = POLICY_REGISTRY.get(policy_type)
    cfg = compile_config(cfg, policy_cls.default_config(), seed, save_cfg=False)
    env = create_env(cfg.env)
    policy = policy_cls(cfg.policy)
    state = policy.init_train_state(jax.random.PRNGKey(seed))
    if model_path:
        state = load_checkpoint_lenient(model_path, target=state)
    evaluator = Evaluator(env, policy, cfg.env.get("evaluator_env_num", 3))
    return evaluator.eval(state.params, n_episodes=n_episodes)
