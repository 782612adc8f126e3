"""Collector/evaluator over host-side (eager) envs.

Equivalent of the reference's MuZeroCollector/Evaluator driving a ding
vec-env (muzero_collector.py:308): the fused jitted search still runs a
whole env batch per call; only the env stepping happens on host.
"""
from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from lightzero_tpu.buffers.game_buffer import EpisodeRecord
from lightzero_tpu.envs.host_env import HostVecEnv
from lightzero_tpu.workers.collector import _EpisodeBuilder


class HostCollector:
    def __init__(self, env: HostVecEnv, policy, rng: Optional[jax.Array] = None):
        self.env = env
        self.policy = policy
        self.num_envs = env.num_envs
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self._builders = [_EpisodeBuilder() for _ in range(self.num_envs)]
        self.total_env_steps = 0
        self.total_episodes = 0
        self.episode_returns: List[float] = []
        self._env_return = np.zeros(self.num_envs)
        self._obs = None
        self._collect_state = None
        if getattr(policy, "stateful_collect", False):
            self._jit_stateful = jax.jit(
                policy._forward_collect_stateful, static_argnames=("deterministic",)
            )

    def collect(self, params, temperature=1.0, epsilon=0.0, num_episodes: Optional[int] = None,
                min_steps: Optional[int] = None):
        t0 = time.time()
        stateful = getattr(self.policy, "stateful_collect", False)
        if self._obs is None:
            self._obs, self._legal, self._to_play = self.env.reset_all()
            if stateful:
                self._collect_state = self.policy.init_collect_state(self.num_envs)
        episodes, priorities = [], []
        steps = 0
        while True:
            self.rng, r = jax.random.split(self.rng)
            args = (
                params, r, jnp.asarray(self._obs), jnp.asarray(self._legal),
                jnp.asarray(self._to_play, jnp.int32),
                jnp.asarray(temperature, jnp.float32), jnp.asarray(epsilon, jnp.float32),
            )
            if stateful:
                out, self._collect_state = self._jit_stateful(
                    *args, self._collect_state, deterministic=False
                )
            else:
                out = self.policy._jit_collect(*args, deterministic=False)
            out = {k: np.asarray(v) for k, v in out.items()}
            next_obs, rewards, dones, next_legal, next_to_play = self.env.step(out["action"])
            pri = np.abs(out["predicted_value"] - out["searched_value"])
            for e in range(self.num_envs):
                a = out["action"][e]
                self._builders[e].append(
                    self._obs[e], a if a.ndim > 0 else int(a), float(rewards[e]),
                    out["visit_counts"][e], float(out["searched_value"][e]),
                    self._legal[e], int(self._to_play[e]), float(pri[e]),
                    root_sampled_actions=out.get("root_sampled_actions", [None] * self.num_envs)[e]
                    if "root_sampled_actions" in out else None,
                )
                self._env_return[e] += float(rewards[e])
                if dones[e]:
                    ep, p = self._builders[e].finish(truncated=False)
                    episodes.append(ep)
                    priorities.append(p)
                    self.episode_returns.append(self._env_return[e])
                    self._env_return[e] = 0.0
                    self.total_episodes += 1
                    self._builders[e] = _EpisodeBuilder()
            if stateful and dones.any():
                self._collect_state = self.policy.reset_collect_state(
                    self._collect_state, jnp.asarray(dones)
                )
            self._obs, self._legal, self._to_play = next_obs, next_legal, next_to_play
            steps += self.num_envs
            self.total_env_steps += self.num_envs
            if num_episodes is not None and len(episodes) >= num_episodes:
                break
            if min_steps is not None and steps >= min_steps:
                break
        stats = dict(
            steps=steps,
            episodes=len(episodes),
            duration=time.time() - t0,
            steps_per_sec=steps / max(time.time() - t0, 1e-9),
            mean_return=(float(np.mean(self.episode_returns[-20:])) if self.episode_returns else 0.0),
        )
        return episodes, priorities, stats


class HostEvaluator:
    def __init__(self, env: HostVecEnv, policy, rng: Optional[jax.Array] = None):
        self.env = env
        self.policy = policy
        self.num_envs = env.num_envs
        self.rng = rng if rng is not None else jax.random.PRNGKey(321)
        self.best_return = -np.inf
        if getattr(policy, "stateful_collect", False):
            self._jit_stateful = jax.jit(
                policy._forward_collect_stateful, static_argnames=("deterministic",)
            )

    def eval(self, params, n_episodes: Optional[int] = None, max_steps: int = 20_000) -> Dict:
        t0 = time.time()
        n_episodes = n_episodes or self.num_envs
        stateful = getattr(self.policy, "stateful_collect", False)
        obs, legal, to_play = self.env.reset_all()
        collect_state = self.policy.init_collect_state(self.num_envs) if stateful else None
        returns: List[float] = []
        acc = np.zeros(self.num_envs)
        steps = 0
        while len(returns) < n_episodes and steps < max_steps:
            self.rng, r = jax.random.split(self.rng)
            args = (
                params, r, jnp.asarray(obs), jnp.asarray(legal),
                jnp.asarray(to_play, jnp.int32),
                jnp.asarray(1.0, jnp.float32), jnp.asarray(0.0, jnp.float32),
            )
            if stateful:
                out, collect_state = self._jit_stateful(
                    *args, collect_state, deterministic=True
                )
            else:
                out = self.policy._jit_collect(*args, deterministic=True)
            out = {k: np.asarray(v) for k, v in out.items()}
            obs, rewards, dones, legal, to_play = self.env.step(out["action"])
            steps += 1
            for e in range(self.num_envs):
                acc[e] += rewards[e]
                if dones[e]:
                    returns.append(acc[e])
                    acc[e] = 0.0
            if stateful and dones.any():
                collect_state = self.policy.reset_collect_state(collect_state, jnp.asarray(dones))
        mean_ret = float(np.mean(returns[:n_episodes])) if returns else 0.0
        new_best = mean_ret > self.best_return
        if new_best:
            self.best_return = mean_ret
        return dict(
            episode_returns=returns[:n_episodes],
            mean_return=mean_ret,
            max_return=float(np.max(returns[:n_episodes])) if returns else 0.0,
            min_return=float(np.min(returns[:n_episodes])) if returns else 0.0,
            new_best=new_best,
            duration=time.time() - t0,
        )
