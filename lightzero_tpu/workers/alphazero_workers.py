"""AlphaZero self-play collector + vs-bot evaluator.

Reference: lzero/worker/alphazero_collector.py (self-play (state,
mcts_prob, winner-z) tuples with per-step perspective flipping) and
alphazero_evaluator.py (deterministic eval vs bot). Rebuilt as jitted
scan rollouts over the pure board env.
"""
from __future__ import annotations

import time
from typing import Dict, List, NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


class AZSample(NamedTuple):
    obs: np.ndarray
    probs: np.ndarray
    z: float


class AlphaZeroSelfPlayCollector:
    def __init__(self, env, policy, num_envs: int, rollout_length: int = 16, rng=None):
        assert env.battle_mode == "self_play_mode"
        self.env = env
        self.policy = policy
        self.num_envs = num_envs
        self.rollout_length = rollout_length
        self.rng = rng if rng is not None else jax.random.PRNGKey(7)
        self.total_env_steps = 0
        self.total_episodes = 0
        self._state = None
        self._pending: List[List] = [[] for _ in range(num_envs)]
        self._jit_rollout = jax.jit(self._rollout)

    def _init_states(self):
        def make(_):
            return self.env.init_state()

        return jax.vmap(make)(jnp.arange(self.num_envs))

    def _rollout(self, params, env_state, rng, temperature):
        def one_step(carry, step_rng):
            s = carry
            p_rng, e_rng = jax.random.split(step_rng)
            out = self.policy._forward_collect(params, p_rng, s, temperature, deterministic=False)
            mover = s.to_play
            step_rngs = jax.random.split(e_rng, self.num_envs)
            step = jax.vmap(self.env.step)(s, out["action"], step_rngs)
            rec = dict(
                obs=out["obs"],
                visit_counts=out["visit_counts"],
                mover=mover,
                reward=step.reward,
                done=step.done,
            )
            return step.state, rec

        rngs = jax.random.split(rng, self.rollout_length)
        return jax.lax.scan(one_step, env_state, rngs)

    def collect(self, params, temperature=1.0, num_episodes: int = 8) -> Tuple[List[AZSample], Dict]:
        t0 = time.time()
        if self._state is None:
            self._state = self._init_states()
        samples: List[AZSample] = []
        episodes = 0
        steps = 0
        while episodes < num_episodes:
            self.rng, r = jax.random.split(self.rng)
            self._state, rec = self._jit_rollout(
                params, self._state, r, jnp.asarray(temperature, jnp.float32)
            )
            rec = jax.tree_util.tree_map(np.asarray, rec)
            T = self.rollout_length
            steps += T * self.num_envs
            self.total_env_steps += T * self.num_envs
            visits = rec["visit_counts"].astype(np.float64)
            probs = visits / np.maximum(visits.sum(-1, keepdims=True), 1e-9)
            for t in range(T):
                for e in range(self.num_envs):
                    self._pending[e].append(
                        (rec["obs"][t, e], probs[t, e], int(rec["mover"][t, e]))
                    )
                    if rec["done"][t, e]:
                        # winner = mover of the final step iff reward > 0
                        last_mover = int(rec["mover"][t, e])
                        winner = last_mover if rec["reward"][t, e] > 0 else 0
                        for obs_i, probs_i, mover_i in self._pending[e]:
                            if winner == 0:
                                z = 0.0
                            else:
                                z = 1.0 if mover_i == winner else -1.0
                            samples.append(AZSample(obs_i, probs_i.astype(np.float32), z))
                        self._pending[e] = []
                        episodes += 1
                        self.total_episodes += 1
        stats = dict(
            steps=steps,
            episodes=episodes,
            duration=time.time() - t0,
            steps_per_sec=steps / max(time.time() - t0, 1e-9),
        )
        return samples, stats


class AlphaZeroBotEvaluator:
    """Deterministic agent (player 1) vs rule bot (battle_mode =
    play_with_bot_mode env). Reports mean reward: +1 win, 0 draw, -1 loss."""

    def __init__(self, env, policy, num_envs: int = 4, rollout_length: int = 10, rng=None):
        assert env.battle_mode in ("play_with_bot_mode", "eval_mode")
        self.env = env
        self.policy = policy
        self.num_envs = num_envs
        self.rollout_length = rollout_length
        self.rng = rng if rng is not None else jax.random.PRNGKey(99)
        self.best_return = -np.inf
        self._jit_rollout = jax.jit(self._rollout)

    def _rollout(self, params, env_state, rng):
        def one_step(s, step_rng):
            p_rng, e_rng = jax.random.split(step_rng)
            out = self.policy._forward_collect(
                params, p_rng, s, jnp.asarray(1.0, jnp.float32), deterministic=True
            )
            step_rngs = jax.random.split(e_rng, self.num_envs)
            step = jax.vmap(self.env.step)(s, out["action"], step_rngs)
            return step.state, dict(reward=step.reward, done=step.done)

        rngs = jax.random.split(rng, self.rollout_length)
        return jax.lax.scan(one_step, env_state, rngs)

    def eval(self, params, n_episodes: Optional[int] = None) -> Dict:
        t0 = time.time()
        n_episodes = n_episodes or self.num_envs

        def make(_):
            return self.env.init_state()

        state = jax.vmap(make)(jnp.arange(self.num_envs))
        outcomes: List[float] = []
        while len(outcomes) < n_episodes:
            self.rng, r = jax.random.split(self.rng)
            state, rec = self._jit_rollout(params, state, r)
            rec = jax.tree_util.tree_map(np.asarray, rec)
            for t in range(self.rollout_length):
                for e in range(self.num_envs):
                    if rec["done"][t, e]:
                        outcomes.append(float(rec["reward"][t, e]))
        mean_ret = float(np.mean(outcomes[:n_episodes]))
        new_best = mean_ret > self.best_return
        if new_best:
            self.best_return = mean_ret
        return dict(
            episode_returns=outcomes[:n_episodes],
            mean_return=mean_ret,
            win_rate=float(np.mean([o > 0 for o in outcomes[:n_episodes]])),
            draw_rate=float(np.mean([o == 0 for o in outcomes[:n_episodes]])),
            new_best=new_best,
            duration=time.time() - t0,
        )
