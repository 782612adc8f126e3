"""Cue-recall memory env (pure JAX).

Capability-parity stand-in for the reference's pycolab memory envs
(zoo/memory: visual_match / key_to_door with memory_length up to 500 —
the long-context stress tests for UniZero, SURVEY.md §5.7):

- step 0: a cue (one of ``num_cues``) is shown in the observation;
- steps 1..memory_length: blank distractor phase (actions ignored);
- final step: query phase — the agent must answer with action == cue.
  reward +1 correct / -1 wrong, episode ends.

Solving it requires carrying information across ``memory_length`` steps —
impossible for a frame-stacked MuZero with a small stack, natural for
UniZero's transformer context.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from lightzero_tpu.envs.base import EnvStep, JaxEnv
from lightzero_tpu.utils import ENV_REGISTRY


class MemoryState(NamedTuple):
    cue: jnp.ndarray  # int32
    t: jnp.ndarray  # int32 current step (0 = cue phase)


@ENV_REGISTRY.register("memory")
class MemoryEnv(JaxEnv):
    num_players = 1

    def __init__(self, num_cues: int = 4, memory_length: int = 10):
        self.num_cues = num_cues
        self.memory_length = memory_length
        self.action_space_size = num_cues
        # obs: [phase one-hot (3) | cue one-hot (visible in phase 0 only) | t/T]
        self.observation_shape = 3 + num_cues + 1
        self._episode_len = memory_length + 2  # cue + memory + query

    def _obs(self, s: MemoryState) -> jnp.ndarray:
        T = self._episode_len
        phase = jnp.where(s.t == 0, 0, jnp.where(s.t <= self.memory_length, 1, 2))
        phase_oh = jax.nn.one_hot(phase, 3, dtype=jnp.float32)
        cue_oh = jax.nn.one_hot(s.cue, self.num_cues, dtype=jnp.float32)
        cue_vis = jnp.where(phase == 0, cue_oh, jnp.zeros_like(cue_oh))
        return jnp.concatenate([phase_oh, cue_vis, (s.t / T)[None].astype(jnp.float32)])

    def reset(self, rng: jax.Array) -> Tuple[MemoryState, jnp.ndarray]:
        cue = jax.random.randint(rng, (), 0, self.num_cues)
        s = MemoryState(cue=cue.astype(jnp.int32), t=jnp.zeros((), jnp.int32))
        return s, self._obs(s)

    def legal_mask(self, state: MemoryState) -> jnp.ndarray:
        return jnp.ones((self.num_cues,), bool)

    def step(self, s: MemoryState, action: jnp.ndarray, rng: jax.Array) -> EnvStep:
        t = s.t + 1
        is_query_answer = s.t == self.memory_length + 1
        reward = jnp.where(
            is_query_answer,
            jnp.where(action == s.cue, 1.0, -1.0),
            0.0,
        ).astype(jnp.float32)
        done = is_query_answer
        ns = MemoryState(cue=s.cue, t=t)
        reset_s, _ = self.reset(rng)
        out = jax.tree_util.tree_map(lambda a, b: jnp.where(done, a, b), reset_s, ns)
        return EnvStep(
            state=out,
            obs=self._obs(out),
            reward=reward,
            done=done,
            legal_mask=jnp.ones((self.num_cues,), bool),
            to_play=jnp.full((), -1, jnp.int32),
        )
