"""Deterministic evaluator (reference MuZeroEvaluator,
lzero/worker/muzero_evaluator.py:193): n episodes with argmax action
selection and no root noise; tracks best return for checkpointing."""
from __future__ import annotations

import time
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from lightzero_tpu.envs.base import JaxEnv


class Evaluator:
    def __init__(
        self,
        env: JaxEnv,
        policy,
        num_envs: int = 3,
        rollout_length: int = 64,
        rng: Optional[jax.Array] = None,
    ):
        self.env = env
        self.policy = policy
        self.num_envs = num_envs
        self.rollout_length = rollout_length
        self.rng = rng if rng is not None else jax.random.PRNGKey(1234)
        self.best_return = -np.inf
        self._jit_rollout = jax.jit(self._rollout, static_argnames=("record",))
        self._jit_reset = jax.jit(self._reset_all)

    def _reset_all(self, rng):
        rngs = jax.random.split(rng, self.num_envs)
        state, obs = jax.vmap(self.env.reset)(rngs)
        legal = jax.vmap(self.env.legal_mask)(state)
        to_play = jnp.full((self.num_envs,), -1, jnp.int32)
        collect_state = (
            self.policy.init_collect_state(self.num_envs)
            if getattr(self.policy, "stateful_collect", False)
            else None
        )
        return state, obs, legal, to_play, collect_state

    def _rollout(self, params, carry, rng, record=False):
        stateful = getattr(self.policy, "stateful_collect", False)

        def one_step(c, step_rng):
            env_state, obs, legal, to_play, collect_state = c
            p_rng, e_rng = jax.random.split(step_rng)
            if stateful:
                out, collect_state = self.policy._forward_collect_stateful(
                    params, p_rng, obs, legal, to_play,
                    jnp.asarray(1.0, jnp.float32), jnp.asarray(0.0, jnp.float32),
                    collect_state, deterministic=True,
                )
            else:
                out = self.policy._forward_collect(
                    params,
                    p_rng,
                    obs,
                    legal,
                    to_play,
                    jnp.asarray(1.0, jnp.float32),
                    jnp.asarray(0.0, jnp.float32),
                    deterministic=True,
                )
            step_rngs = jax.random.split(e_rng, self.num_envs)
            step = jax.vmap(self.env.step)(env_state, out["action"], step_rngs)
            if stateful:
                collect_state = self.policy.reset_collect_state(collect_state, step.done)
            rec = dict(reward=step.reward, done=step.done)
            if record:  # replay capture (reference deploy enable_save_replay)
                rec["obs"] = obs
                rec["action"] = out["action"]
            return (step.state, step.obs, step.legal_mask, step.to_play, collect_state), rec

        rngs = jax.random.split(rng, self.rollout_length)
        return jax.lax.scan(one_step, carry, rngs)

    def eval(
        self,
        params,
        n_episodes: Optional[int] = None,
        max_steps: int = 10_000,
        save_replay_path: Optional[str] = None,
    ) -> Dict:
        """Run until each env finishes >= 1 episode (>= n_episodes total).
        With ``save_replay_path``, each finished episode's (obs, actions,
        rewards) trajectory is written as episode_<i>.npz there (role of the
        reference's deploy(enable_save_replay), agent/muzero.py:267)."""
        t0 = time.time()
        n_episodes = n_episodes or self.num_envs
        record = save_replay_path is not None
        if record:
            import os

            os.makedirs(save_replay_path, exist_ok=True)
            traj = [dict(obs=[], action=[], reward=[]) for _ in range(self.num_envs)]
        self.rng, r = jax.random.split(self.rng)
        carry = self._jit_reset(r)
        returns = []
        acc = np.zeros(self.num_envs)
        steps = 0
        while len(returns) < n_episodes and steps < max_steps:
            self.rng, r = jax.random.split(self.rng)
            carry, rec = self._jit_rollout(params, carry, r, record=record)
            rec = jax.tree_util.tree_map(np.asarray, rec)
            for t in range(self.rollout_length):
                steps += 1
                for e in range(self.num_envs):
                    acc[e] += rec["reward"][t, e]
                    if record:
                        traj[e]["obs"].append(rec["obs"][t, e])
                        traj[e]["action"].append(rec["action"][t, e])
                        traj[e]["reward"].append(rec["reward"][t, e])
                    if rec["done"][t, e]:
                        if record:
                            import os

                            np.savez_compressed(
                                os.path.join(
                                    save_replay_path, f"episode_{len(returns)}.npz"
                                ),
                                obs=np.asarray(traj[e]["obs"]),
                                actions=np.asarray(traj[e]["action"]),
                                rewards=np.asarray(traj[e]["reward"]),
                                episode_return=acc[e] + 0.0,
                            )
                            traj[e] = dict(obs=[], action=[], reward=[])
                        returns.append(acc[e])
                        acc[e] = 0.0
        mean_ret = float(np.mean(returns)) if returns else 0.0
        new_best = mean_ret > self.best_return
        if new_best:
            self.best_return = mean_ret
        return dict(
            episode_returns=returns,
            mean_return=mean_ret,
            max_return=float(np.max(returns)) if returns else 0.0,
            min_return=float(np.min(returns)) if returns else 0.0,
            new_best=new_best,
            duration=time.time() - t0,
        )
