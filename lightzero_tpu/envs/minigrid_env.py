"""MiniGrid host env adapter (gated on the ``minigrid`` package).

Capability-parity rebuild of reference
zoo/minigrid/envs/minigrid_lightzero_env.py: gym.make of a MiniGrid task,
optional ViewSizeWrapper field-of-view overrides for the AKTDT memory
variants, FlatObsWrapper flattening to a (2835,) float vector, action mask
all-ones over the 7 discrete actions, to_play=-1. Batched eagerly on the
host (same interface as HostVecEnv) since MiniGrid is not jittable.

The package is absent from this build image, so the env registers as a
*gated* adapter: ``is_available()`` is False and construction raises with
a clear message — the code path is complete and covered by interface
tests; only the library is missing.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def is_available() -> bool:
    try:
        import minigrid  # noqa: F401
        import gymnasium

        return True
    except Exception:
        return False


class MiniGridVecEnv:
    """Eager host-batched MiniGrid (HostVecEnv interface: reset_all/step)."""

    #: AKTDT memory variants use a narrowed agent field of view
    #: (minigrid_lightzero_env.py:91-96)
    _VIEW_SIZE = {
        "MiniGrid-AKTDT-13x13-v0": 5,
        "MiniGrid-AKTDT-13x13-1-v0": 5,
        "MiniGrid-AKTDT-7x7-1-v0": 3,
    }

    def __init__(
        self,
        env_id: str = "MiniGrid-Empty-8x8-v0",
        num_envs: int = 1,
        seed: int = 0,
        max_step: int = 300,
        flat_obs: bool = True,
    ):
        if not is_available():
            raise ImportError(
                "minigrid is not installed in this image; MiniGridVecEnv is a "
                "gated adapter (zoo/minigrid configs compile but cannot run)"
            )
        import gymnasium as gym
        from minigrid.wrappers import FlatObsWrapper, ViewSizeWrapper

        self.env_id = env_id
        self.num_envs = num_envs
        self.max_step = max_step
        self._envs = []
        for _ in range(num_envs):
            e = gym.make(env_id)
            e.unwrapped.max_steps = max_step
            if env_id in self._VIEW_SIZE:
                e = ViewSizeWrapper(e, agent_view_size=self._VIEW_SIZE[env_id])
            if flat_obs:
                e = FlatObsWrapper(e)
            self._envs.append(e)
        self._seeds = [seed + i for i in range(num_envs)]
        self._steps = np.zeros(num_envs, np.int64)
        self.action_space_size = int(self._envs[0].action_space.n)
        o_space = self._envs[0].observation_space
        self.observation_shape = (
            int(o_space.shape[0]) if len(o_space.shape) == 1 else tuple(o_space.shape)
        )
        self.continuous = False

    def _reset_one(self, i: int) -> np.ndarray:
        obs, _ = self._envs[i].reset(seed=self._seeds[i])
        self._seeds[i] += 10_000
        self._steps[i] = 0
        return np.asarray(obs, np.float32)

    def reset_all(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        obs = np.stack([self._reset_one(i) for i in range(self.num_envs)])
        B = self.num_envs
        legal = np.ones((B, self.action_space_size), bool)
        return obs, legal, np.full((B,), -1, np.int64)

    def step(self, actions: np.ndarray):
        obs, rewards, dones = [], [], []
        for i, e in enumerate(self._envs):
            o, r, term, trunc, _ = e.step(int(actions[i]))
            self._steps[i] += 1
            d = bool(term or trunc or self._steps[i] >= self.max_step)
            if d:
                o = self._reset_one(i)
            obs.append(np.asarray(o, np.float32))
            rewards.append(float(r))
            dones.append(d)
        B = self.num_envs
        legal = np.ones((B, self.action_space_size), bool)
        return (
            np.stack(obs),
            np.asarray(rewards, np.float32),
            np.asarray(dones, bool),
            legal,
            np.full((B,), -1, np.int64),
        )
