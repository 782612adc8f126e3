"""MetaDrive driving host env adapter (gated on ``metadrive``).

Capability-parity rebuild of reference zoo/metadrive/env/metadrive_
lightzero_env.py: procedural driving scenarios with continuous
(steering, throttle) actions in [-1, 1] and lidar+state vector
observations; batched eagerly on the host (HostVecEnv interface).

metadrive is absent from this image → gated adapter (is_available()
False); configs compile, construction raises with a clear message.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def is_available() -> bool:
    try:
        import metadrive  # noqa: F401

        return True
    except Exception:
        return False


class MetaDriveVecEnv:
    """Eager host-batched MetaDrive (reset_all/step interface)."""

    def __init__(
        self,
        num_envs: int = 1,
        seed: int = 0,
        env_config: Optional[dict] = None,
    ):
        if not is_available():
            raise ImportError(
                "metadrive is not installed in this image; MetaDriveVecEnv is "
                "a gated adapter (zoo/metadrive configs compile but cannot run)"
            )
        from metadrive import MetaDriveEnv

        cfg = dict(use_render=False, traffic_density=0.1, start_seed=seed)
        cfg.update(env_config or {})
        self.num_envs = num_envs
        self._envs = [MetaDriveEnv(dict(cfg, start_seed=seed + i)) for i in range(num_envs)]
        space = self._envs[0].action_space
        self.action_space_size = int(np.prod(space.shape))
        self.continuous = True
        self._low = np.asarray(space.low, np.float32)
        self._high = np.asarray(space.high, np.float32)
        self.observation_shape = int(np.prod(self._envs[0].observation_space.shape))

    def reset_all(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        obs = []
        for e in self._envs:
            o, _ = e.reset()
            obs.append(np.asarray(o, np.float32).ravel())
        B = self.num_envs
        return np.stack(obs), np.ones((B, self.action_space_size), bool), np.full((B,), -1, np.int64)

    def step(self, actions: np.ndarray):
        obs, rewards, dones = [], [], []
        for i, e in enumerate(self._envs):
            a = self._low + (np.clip(np.asarray(actions[i], np.float32), -1, 1) + 1) * 0.5 * (
                self._high - self._low
            )
            o, r, term, trunc, _ = e.step(a)
            d = bool(term or trunc)
            if d:
                o, _ = e.reset()
            obs.append(np.asarray(o, np.float32).ravel())
            rewards.append(float(r))
            dones.append(d)
        B = self.num_envs
        return (
            np.stack(obs),
            np.asarray(rewards, np.float32),
            np.asarray(dones, bool),
            np.ones((B, self.action_space_size), bool),
            np.full((B,), -1, np.int64),
        )
