"""DeepMind Control suite host env adapter (gated on ``dm_control``).

Capability-parity rebuild of reference zoo/dmc2gym/envs/dmc2gym_lightzero
_env.py: a (domain, task) pair from the dm_control suite exposed with
flattened float observations and continuous actions normalized to
[-1, 1]; from_pixels variants render (height, width, 3) frames. Batched
eagerly on the host (HostVecEnv interface).

dm_control is absent from this image → gated adapter (is_available()
False); configs compile, construction raises with a clear message.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def is_available() -> bool:
    try:
        from dm_control import suite  # noqa: F401

        return True
    except Exception:
        return False


def _flatten_obs(obs_dict) -> np.ndarray:
    return np.concatenate(
        [np.asarray(v, np.float32).ravel() for v in obs_dict.values()]
    )


class DMC2GymVecEnv:
    """Eager host-batched dm_control suite env (reset_all/step interface)."""

    def __init__(
        self,
        domain_name: str = "cartpole",
        task_name: str = "swingup",
        num_envs: int = 1,
        seed: int = 0,
        from_pixels: bool = False,
        height: int = 84,
        width: int = 84,
        frame_skip: int = 2,
    ):
        if not is_available():
            raise ImportError(
                "dm_control is not installed in this image; DMC2GymVecEnv is "
                "a gated adapter (zoo/dmc2gym configs compile but cannot run)"
            )
        from dm_control import suite

        self.num_envs = num_envs
        self.from_pixels = from_pixels
        self.height, self.width = height, width
        self.frame_skip = frame_skip
        self._envs = [
            suite.load(domain_name, task_name, task_kwargs={"random": seed + i})
            for i in range(num_envs)
        ]
        spec = self._envs[0].action_spec()
        self.action_space_size = int(np.prod(spec.shape))
        self.continuous = True
        self._low = np.asarray(spec.minimum, np.float32)
        self._high = np.asarray(spec.maximum, np.float32)
        ts = self._envs[0].reset()
        self.observation_shape = (
            (height, width, 3) if from_pixels else int(_flatten_obs(ts.observation).shape[0])
        )

    def _obs(self, i: int, ts) -> np.ndarray:
        if self.from_pixels:
            return np.asarray(
                self._envs[i].physics.render(self.height, self.width, camera_id=0),
                np.float32,
            )
        return _flatten_obs(ts.observation)

    def reset_all(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        obs = np.stack([self._obs(i, e.reset()) for i, e in enumerate(self._envs)])
        B = self.num_envs
        return obs, np.ones((B, self.action_space_size), bool), np.full((B,), -1, np.int64)

    def step(self, actions: np.ndarray):
        obs, rewards, dones = [], [], []
        for i, e in enumerate(self._envs):
            a = self._low + (np.clip(np.asarray(actions[i], np.float32), -1, 1) + 1) * 0.5 * (
                self._high - self._low
            )
            r_total, ts = 0.0, None
            for _ in range(self.frame_skip):
                ts = e.step(a)
                r_total += float(ts.reward or 0.0)
                if ts.last():
                    break
            d = bool(ts.last())
            if d:
                ts = e.reset()
            obs.append(self._obs(i, ts))
            rewards.append(r_total)
            dones.append(d)
        B = self.num_envs
        return (
            np.stack(obs),
            np.asarray(rewards, np.float32),
            np.asarray(dones, bool),
            np.ones((B, self.action_space_size), bool),
            np.full((B,), -1, np.int64),
        )
