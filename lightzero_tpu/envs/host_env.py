"""Host-side batched env adapter for non-jittable envs (gymnasium).

Role of the reference's ding subprocess env manager + per-env BaseEnv
wrappers (SURVEY.md §2.8) for envs that cannot be expressed as pure JAX
step functions (box2d, MuJoCo, Atari/ALE when present). Envs step eagerly
in-process in a batch; the policy side stays jitted on device.
"""
from __future__ import annotations

from typing import Any, List, Optional, Tuple

import numpy as np


class HostVecEnv:
    def __init__(self, env_id: str, num_envs: int, seed: int = 0, env_kwargs: Optional[dict] = None):
        import gymnasium

        self.env_id = env_id
        self.num_envs = num_envs
        self._envs = [gymnasium.make(env_id, **(env_kwargs or {})) for _ in range(num_envs)]
        self._seeds = [seed + i for i in range(num_envs)]
        space = self._envs[0].action_space
        import gymnasium.spaces as spaces

        if isinstance(space, spaces.Discrete):
            self.action_space_size = int(space.n)
            self.continuous = False
        else:
            self.action_space_size = int(np.prod(space.shape))
            self.continuous = True
            self._low = np.asarray(space.low, np.float32)
            self._high = np.asarray(space.high, np.float32)
        obs_space = self._envs[0].observation_space
        self.observation_shape = tuple(obs_space.shape) if len(obs_space.shape) > 1 else int(obs_space.shape[0])

    def reset_all(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        obs = []
        for i, e in enumerate(self._envs):
            o, _ = e.reset(seed=self._seeds[i])
            self._seeds[i] += 10_000
            obs.append(o)
        B = self.num_envs
        legal = np.ones((B, max(self.action_space_size, 1)), bool)
        return np.asarray(obs, np.float32), legal, np.full((B,), -1, np.int64)

    def step(self, actions: np.ndarray):
        obs, rewards, dones, chances = [], [], [], []
        for i, e in enumerate(self._envs):
            a = actions[i]
            if self.continuous:
                # normalized [-1, 1] → action bounds
                a = self._low + (np.clip(np.asarray(a, np.float32), -1, 1) + 1) * 0.5 * (
                    self._high - self._low
                )
            else:
                a = int(a)
            o, r, term, trunc, _ = e.step(a)
            d = bool(term or trunc)
            if d:
                o, _ = e.reset(seed=self._seeds[i])
                self._seeds[i] += 10_000
            obs.append(o)
            rewards.append(r)
            dones.append(d)
        B = self.num_envs
        legal = np.ones((B, max(self.action_space_size, 1)), bool)
        return (
            np.asarray(obs, np.float32),
            np.asarray(rewards, np.float32),
            np.asarray(dones, bool),
            legal,
            np.full((B,), -1, np.int64),
        )
