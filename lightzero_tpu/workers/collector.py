"""Self-play collector over pure-JAX envs.

TPU-native replacement for reference MuZeroCollector
(lzero/worker/muzero_collector.py:308): instead of a subprocess vec-env and
a per-step host↔device↔C++ loop, a whole rollout chunk
[initial_inference → fused MCTS → action sample → env step → auto-reset]
runs as ONE jitted lax.scan; the host only slices the resulting trajectory
arrays into finished episodes for the buffer.
"""
from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from lightzero_tpu.buffers.game_buffer import EpisodeRecord
from lightzero_tpu.envs.base import JaxEnv


class _EpisodeBuilder:
    """Accumulates per-env step records across rollout chunks."""

    def __init__(self, prefix_obs: Optional[np.ndarray] = None):
        # obs of the frame_stack-1 steps before this record's start (set when
        # a builder continues an episode that was flushed mid-way), so the
        # buffer's frame stacking does not zero-pad across the flush boundary
        self.prefix_obs = prefix_obs
        self.obs: List[np.ndarray] = []
        self.actions: List[int] = []
        self.rewards: List[float] = []
        self.child_visits: List[np.ndarray] = []
        self.root_values: List[float] = []
        self.legal: List[np.ndarray] = []
        self.to_play: List[int] = []
        self.priorities: List[float] = []
        self.chance: List[int] = []
        self.root_sampled_actions: List[np.ndarray] = []

    def append(self, obs, action, reward, visits, root_value, legal, to_play, priority, chance=0,
               root_sampled_actions=None):
        self.obs.append(obs)
        self.actions.append(action)
        self.rewards.append(reward)
        self.child_visits.append(visits)
        self.root_values.append(root_value)
        self.legal.append(legal)
        self.to_play.append(to_play)
        self.priorities.append(priority)
        self.chance.append(chance)
        if root_sampled_actions is not None:
            self.root_sampled_actions.append(root_sampled_actions)

    def __len__(self):
        return len(self.actions)

    def finish(self, truncated: bool) -> Tuple[EpisodeRecord, np.ndarray]:
        visits = np.asarray(self.child_visits, np.float32)
        sums = visits.sum(-1, keepdims=True)
        actions_arr = np.asarray(self.actions)
        if actions_arr.dtype.kind == 'f' or actions_arr.ndim > 1:
            actions_arr = actions_arr.astype(np.float32)
        else:
            actions_arr = actions_arr.astype(np.int64)
        ep = EpisodeRecord(
            obs=np.asarray(self.obs, np.float32),
            actions=actions_arr,
            rewards=np.asarray(self.rewards, np.float32),
            child_visits=visits / np.maximum(sums, 1e-9),
            root_values=np.asarray(self.root_values, np.float32),
            legal_mask=np.asarray(self.legal, bool),
            to_play=np.asarray(self.to_play, np.int64),
            truncated=truncated,
            chance=np.asarray(self.chance, np.int64),
            root_sampled_actions=(
                np.asarray(self.root_sampled_actions, np.float32)
                if self.root_sampled_actions
                else None
            ),
            prefix_obs=self.prefix_obs,
        )
        return ep, np.asarray(self.priorities, np.float64)


class RolloutCollector:
    def __init__(
        self,
        env: JaxEnv,
        policy,
        num_envs: int,
        rollout_length: int = 64,
        rng: Optional[jax.Array] = None,
        flush_min_len: int = 8,
        frame_stack: int = 1,
    ):
        self.env = env
        self.policy = policy
        self.num_envs = num_envs
        self.rollout_length = rollout_length
        # min_steps mode flushes partial episodes at least this long as
        # truncated segments so training can start before the first natural
        # episode end (reference MuZeroSegmentCollector semantics,
        # muzero_segment_collector.py:26-30)
        self.flush_min_len = flush_min_len
        self.frame_stack = frame_stack
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self._builders = [_EpisodeBuilder() for _ in range(num_envs)]
        self.total_env_steps = 0
        self.total_episodes = 0
        self.episode_returns: List[float] = []
        self._last_records: Dict = {}
        self._env_return = np.zeros(num_envs)
        self._state = None
        self._jit_rollout = jax.jit(self._rollout)
        self._jit_reset = jax.jit(self._reset_all)

    def _reset_all(self, rng):
        rngs = jax.random.split(rng, self.num_envs)
        state, obs = jax.vmap(self.env.reset)(rngs)
        legal = jax.vmap(self.env.legal_mask)(state)
        # derive the first root's to_play from the env (board self-play envs
        # return the actual player; -1 otherwise) — hardcoding -1 would
        # search the first two-player root with 1p backup semantics
        to_play = jax.vmap(self.env.initial_to_play)(state).astype(jnp.int32)
        collect_state = (
            self.policy.init_collect_state(self.num_envs)
            if getattr(self.policy, "stateful_collect", False)
            else None
        )
        return state, obs, legal, to_play, collect_state

    def _rollout(self, params, carry, rng, temperature, epsilon):
        """lax.scan of rollout_length fused search+env steps."""
        stateful = getattr(self.policy, "stateful_collect", False)

        def one_step(c, step_rng):
            env_state, obs, legal, to_play, collect_state = c
            p_rng, e_rng = jax.random.split(step_rng)
            if stateful:
                out, collect_state = self.policy._forward_collect_stateful(
                    params, p_rng, obs, legal, to_play, temperature, epsilon,
                    collect_state, deterministic=False,
                )
            else:
                out = self.policy._forward_collect(
                    params, p_rng, obs, legal, to_play, temperature, epsilon, deterministic=False
                )
            step_rngs = jax.random.split(e_rng, self.num_envs)
            step = jax.vmap(self.env.step)(env_state, out["action"], step_rngs)
            if stateful:
                collect_state = self.policy.reset_collect_state(collect_state, step.done)
            record = dict(
                obs=obs,
                legal=legal,
                to_play=to_play,
                action=out["action"],
                reward=step.reward,
                done=step.done,
                truncated=step.truncated,
                chance=step.chance,
                visit_counts=out["visit_counts"],
                searched_value=out["searched_value"],
                predicted_value=out["predicted_value"],
                **(
                    {"root_sampled_actions": out["root_sampled_actions"]}
                    if "root_sampled_actions" in out
                    else {}
                ),
                # sampled-policy live telemetry (diagnosing candidate drift)
                **{
                    k: out[k]
                    for k in ("visit_mean_action", "collect_mu", "collect_sigma")
                    if k in out
                },
            )
            return (step.state, step.obs, step.legal_mask, step.to_play, collect_state), record

        rngs = jax.random.split(rng, self.rollout_length)
        carry, records = jax.lax.scan(one_step, carry, rngs)
        return carry, records

    def collect(
        self,
        params,
        temperature: float = 1.0,
        epsilon: float = 0.0,
        num_episodes: Optional[int] = None,
        min_steps: Optional[int] = None,
    ) -> Tuple[List[EpisodeRecord], List[np.ndarray], Dict]:
        """Collect until ``num_episodes`` episodes finished (or ``min_steps``
        env steps taken). Returns (episodes, priorities, stats)."""
        t0 = time.time()
        if self._state is None:
            self.rng, r = jax.random.split(self.rng)
            self._state = self._jit_reset(r)
        episodes: List[EpisodeRecord] = []
        priorities: List[np.ndarray] = []
        steps_taken = 0
        while True:
            self.rng, r = jax.random.split(self.rng)
            self._state, records = self._jit_rollout(
                params,
                self._state,
                r,
                jnp.asarray(temperature, jnp.float32),
                jnp.asarray(epsilon, jnp.float32),
            )
            records = jax.tree_util.tree_map(np.asarray, records)
            self._last_records = records
            T = self.rollout_length
            steps_taken += T * self.num_envs
            self.total_env_steps += T * self.num_envs
            pri = np.abs(records["predicted_value"] - records["searched_value"])
            for t in range(T):
                for e in range(self.num_envs):
                    b = self._builders[e]
                    a = np.asarray(records["action"][t, e])
                    b.append(
                        records["obs"][t, e],
                        a if a.ndim > 0 else int(a),
                        float(records["reward"][t, e]),
                        records["visit_counts"][t, e],
                        float(records["searched_value"][t, e]),
                        records["legal"][t, e],
                        int(records["to_play"][t, e]),
                        float(pri[t, e]),
                        chance=int(np.asarray(records["chance"])[t, e]) if "chance" in records else 0,
                        root_sampled_actions=(
                            records["root_sampled_actions"][t, e]
                            if "root_sampled_actions" in records
                            else None
                        ),
                    )
                    self._env_return[e] += float(records["reward"][t, e])
                    if records["done"][t, e]:
                        ep, p = b.finish(
                            truncated=bool(np.asarray(records["truncated"])[t, e])
                        )
                        episodes.append(ep)
                        priorities.append(p)
                        self.episode_returns.append(self._env_return[e])
                        self._env_return[e] = 0.0
                        self.total_episodes += 1
                        self._builders[e] = _EpisodeBuilder()
            if num_episodes is not None and len(episodes) >= num_episodes:
                break
            if min_steps is not None and steps_taken >= min_steps:
                # flush sufficiently long partial episodes as truncated so
                # training can start before the first natural episode end;
                # the successor builder keeps a frame-stack prefix so obs
                # stacking does not zero-pad across the flush boundary
                for e in range(self.num_envs):
                    b = self._builders[e]
                    if len(b) >= self.flush_min_len:
                        ep, p = b.finish(truncated=True)
                        episodes.append(ep)
                        priorities.append(p)
                        prefix = (
                            ep.obs[-(self.frame_stack - 1):]
                            if self.frame_stack > 1
                            else None
                        )
                        self._builders[e] = _EpisodeBuilder(prefix_obs=prefix)
                break
            if num_episodes is None and min_steps is None:
                break
        stats = dict(
            steps=steps_taken,
            episodes=len(episodes),
            duration=time.time() - t0,
            steps_per_sec=steps_taken / max(time.time() - t0, 1e-9),
            mean_return=(float(np.mean([r for r in self.episode_returns[-20:]]))
                         if self.episode_returns else 0.0),
        )
        for k in ("visit_mean_action", "collect_mu", "collect_sigma"):
            if k in self._last_records:
                stats[k] = float(np.mean(np.asarray(self._last_records[k])))
        # search decisiveness telemetry: mean entropy of the root visit
        # distribution and mean searched root value (the round-4 UniZero
        # post-mortem had to infer both indirectly; now every run logs them)
        if "visit_counts" in self._last_records:
            vc = np.asarray(self._last_records["visit_counts"], np.float64)
            p = vc / np.maximum(vc.sum(-1, keepdims=True), 1e-9)
            ent = -np.sum(p * np.log(np.maximum(p, 1e-12)), axis=-1)
            stats["visit_entropy"] = float(np.mean(ent))
        if "searched_value" in self._last_records:
            stats["searched_value"] = float(
                np.mean(np.asarray(self._last_records["searched_value"]))
            )
        return episodes, priorities, stats
