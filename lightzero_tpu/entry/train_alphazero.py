"""AlphaZero training entry (reference lzero/entry/train_alphazero.py):
self-play collect → uniform replay of (obs, mcts_probs, z) → policy CE +
value MSE updates → periodic eval vs the rule bot."""
from __future__ import annotations

import os
from collections import deque
from typing import Optional

import numpy as np

import jax

from lightzero_tpu.utils.jax_setup import setup_jax

setup_jax()
import jax.numpy as jnp

import lightzero_tpu.envs  # noqa: F401  (populates ENV_REGISTRY)
from lightzero_tpu.config import Config, compile_config
from lightzero_tpu.ops import visit_count_temperature
from lightzero_tpu.policy.alphazero import AlphaZeroPolicy, AZTrainBatch
from lightzero_tpu.policy.gumbel_alphazero import GumbelAlphaZeroPolicy  # noqa: F401
from lightzero_tpu.policy.sampled_alphazero import SampledAlphaZeroPolicy  # noqa: F401
from lightzero_tpu.utils import ENV_REGISTRY
from lightzero_tpu.utils.checkpoint import (
    load_checkpoint_lenient,
    save_checkpoint,
    save_params_export,
)
from lightzero_tpu.utils.logger import ExperimentLogger
from lightzero_tpu.workers.alphazero_workers import (
    AlphaZeroBotEvaluator,
    AlphaZeroSelfPlayCollector,
)


def train_alphazero(
    cfg,
    seed: int = 0,
    model_path: Optional[str] = None,
    max_env_step: int = int(1e6),
    max_train_iter: int = int(1e9),
):
    if isinstance(cfg, (list, tuple)):
        cfg = cfg[0]
    # type dispatch: 'alphazero' (default) / 'gumbel_alphazero' /
    # 'sampled_alphazero' (registered by the module-level imports)
    from lightzero_tpu.utils import POLICY_REGISTRY

    policy_type = Config(cfg).get("policy", {}).get("type", "alphazero")
    policy_cls = POLICY_REGISTRY.get(policy_type)
    cfg = compile_config(cfg, policy_cls.default_config(), seed)
    pcfg = cfg.policy

    env_key = cfg.env.get("type", "tictactoe")
    # forward top-level env keys matching the constructor (board_size, komi,
    # ...); battle_mode is owned by the entry (self-play + bot eval)
    import inspect

    _sig = inspect.signature(ENV_REGISTRY.get(env_key).__init__)
    env_kwargs = {k: v for k, v in dict(cfg.env).items()
                  if k in _sig.parameters and k not in ("self", "battle_mode")}
    env_kwargs.update(dict(cfg.env.get("env_kwargs", {})))
    selfplay_env = ENV_REGISTRY.build(env_key, battle_mode="self_play_mode", **env_kwargs)
    eval_env = ENV_REGISTRY.build(env_key, battle_mode="play_with_bot_mode", **env_kwargs)

    policy = policy_cls(pcfg, selfplay_env)
    rng = jax.random.PRNGKey(seed)
    rng, init_rng = jax.random.split(rng)
    state = policy.init_train_state(init_rng)
    if model_path:
        # lenient: accepts both full TrainState checkpoints and the durable
        # params-only exports written by save_params_export (which lack
        # opt_state/train_iter and would fail a strict structural restore)
        state = load_checkpoint_lenient(model_path, target=state)

    rng, c_rng, e_rng = jax.random.split(rng, 3)
    collector = AlphaZeroSelfPlayCollector(
        selfplay_env, policy, cfg.env.get("collector_env_num", 8), rng=c_rng
    )
    evaluator = AlphaZeroBotEvaluator(
        eval_env, policy, cfg.env.get("evaluator_env_num", 4), rng=e_rng
    )
    logger = ExperimentLogger(cfg.exp_name, "train")
    replay = deque(maxlen=int(pcfg.replay_buffer_size))
    rng_np = np.random.RandomState(seed)

    batch_size = int(pcfg.batch_size)
    stop_value = cfg.env.get("stop_value", 1.0)
    eval_freq = int(pcfg.eval_freq)
    upc = int(pcfg.update_per_collect)
    train_iter = 0
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
            res = evaluator.eval(state.params, cfg.env.get("n_evaluator_episode", 4))
            logger.log_scalars(
                {
                    "eval_mean_return": res["mean_return"],
                    "win_rate": res["win_rate"],
                    "draw_rate": res["draw_rate"],
                },
                collector.total_env_steps,
                prefix="evaluator/",
            )
            logger.info(
                f"iter={train_iter} envstep={collector.total_env_steps} EVAL "
                f"return={res['mean_return']:.2f} win={res['win_rate']:.2f} draw={res['draw_rate']:.2f}"
            )
            if res["new_best"]:
                save_checkpoint(state, os.path.join(cfg.exp_name, "ckpt", "ckpt_best"))
                save_params_export(
                    state, os.path.join(cfg.exp_name, "ckpt", "params_best")
                )
            if res["mean_return"] >= stop_value:
                logger.info("stop_value reached; stopping.")
                break

        samples, cstats = collector.collect(
            state.params, temperature=temperature, num_episodes=int(pcfg.n_episode)
        )
        if bool(pcfg.get("use_augmentation", False)):
            # dihedral symmetry orbit per sample (reference
            # get_augmented_data, lzero/mcts/utils.py:45)
            from lightzero_tpu.ops.board_augment import get_augmented_data

            for s in samples:
                for aug in get_augmented_data(np.asarray(s.obs), np.asarray(s.probs), s.z):
                    replay.append(aug)
        else:
            replay.extend(samples)
        if len(replay) < batch_size:
            continue
        logs = {}
        for _ in range(upc):
            idx = rng_np.randint(0, len(replay), size=batch_size)
            obs = np.stack([replay[i].obs for i in idx])
            probs = np.stack([replay[i].probs for i in idx])
            z = np.asarray([replay[i].z for i in idx], np.float32)
            batch = AZTrainBatch(jnp.asarray(obs), jnp.asarray(probs), jnp.asarray(z))
            state, logs = policy.forward_learn(state, batch)
            train_iter += 1
        logger.log_scalars(dict(logs), collector.total_env_steps, prefix="learner/")
        logger.info(
            f"iter={train_iter} envstep={collector.total_env_steps} "
            f"loss={float(logs.get('total_loss', 0)):.3f} sps={cstats['steps_per_sec']:.0f}"
        )

    save_checkpoint(state, os.path.join(cfg.exp_name, "ckpt", "ckpt_final"))
    logger.close()
    return policy, state, dict(
        env_steps=collector.total_env_steps,
        train_iter=train_iter,
        best_return=evaluator.best_return,
    )


def eval_alphazero(cfg, seed: int = 0, model_path: Optional[str] = None,
                   n_episodes: int = 5):
    """Load an AlphaZero-family checkpoint and evaluate vs the env's rule
    bot (reference lzero/entry/eval_alphazero.py)."""
    if isinstance(cfg, (list, tuple)):
        cfg = cfg[0]
    from lightzero_tpu.utils import POLICY_REGISTRY

    policy_type = Config(cfg).get("policy", {}).get("type", "alphazero")
    policy_cls = POLICY_REGISTRY.get(policy_type)
    cfg = compile_config(cfg, policy_cls.default_config(), seed, save_cfg=False)

    import inspect

    env_key = cfg.env.get("type", "tictactoe")
    _sig = inspect.signature(ENV_REGISTRY.get(env_key).__init__)
    env_kwargs = {k: v for k, v in dict(cfg.env).items()
                  if k in _sig.parameters and k not in ("self", "battle_mode")}
    env_kwargs.update(dict(cfg.env.get("env_kwargs", {})))
    eval_env = ENV_REGISTRY.build(env_key, battle_mode="play_with_bot_mode", **env_kwargs)

    policy = policy_cls(cfg.policy, eval_env)
    rng = jax.random.PRNGKey(seed)
    rng, init_rng, e_rng = jax.random.split(rng, 3)
    state = policy.init_train_state(init_rng)
    if model_path:
        # lenient: params_best exports restore too (see train_alphazero)
        state = load_checkpoint_lenient(model_path, target=state)
    evaluator = AlphaZeroBotEvaluator(
        eval_env, policy, cfg.env.get("evaluator_env_num", 4), rng=e_rng
    )
    return evaluator.eval(state.params, n_episodes)
