"""Atari (ALE) host env with the DeepMind wrapper stack.

Capability-parity rebuild of reference
zoo/atari/envs/atari_lightzero_env.py + atari_wrappers.py:35-48:
noop reset, frame-skip 4 with 2-frame max-pool, 96×96 resize, reward clip,
episodic life, RGB channel-last frames (frame stacking happens in the
replay buffer via ``frame_stack_num``).

NOTE: ale_py is not installed in this build image, so this env registers
only when ALE is importable (``is_available()``); the code path is the
same HostVecEnv-style eager batch interface as box2d.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def is_available() -> bool:
    try:
        import gymnasium

        gymnasium.spec("ALE/Pong-v5")
        return True
    except Exception:
        return False


def _resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Pure-numpy bilinear resize (H, W, C) → (out_h, out_w, C) — replaces
    the reference's cv2 dependency."""
    h, w = img.shape[:2]
    ys = np.linspace(0, h - 1, out_h)
    xs = np.linspace(0, w - 1, out_w)
    y0 = np.floor(ys).astype(np.int32)
    x0 = np.floor(xs).astype(np.int32)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    img = img.astype(np.float32)
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


class AtariEnv:
    """Single ALE env with the DeepMind preprocessing stack."""

    def __init__(
        self,
        env_id: str = "ALE/Pong-v5",
        frame_skip: int = 4,
        noop_max: int = 30,
        size: int = 96,
        gray: bool = False,
        clip_rewards: bool = True,
        episode_life: bool = True,
        max_episode_steps: int = 108_000,
        seed: int = 0,
    ):
        import gymnasium

        self._env = gymnasium.make(env_id, frameskip=1, repeat_action_probability=0.0)
        self.frame_skip = frame_skip
        self.noop_max = noop_max
        self.size = size
        self.gray = gray
        self.clip_rewards = clip_rewards
        self.episode_life = episode_life
        self.max_episode_steps = max_episode_steps
        self.action_space_size = int(self._env.action_space.n)
        self.observation_shape = (size, size, 1 if gray else 3)
        self._rng = np.random.RandomState(seed)
        self._lives = 0
        self._t = 0

    def _obs(self, frame: np.ndarray) -> np.ndarray:
        if self.gray:
            frame = frame.mean(-1, keepdims=True)
        return (_resize_bilinear(frame, self.size, self.size) / 255.0).astype(np.float32)

    def reset(self):
        frame, _ = self._env.reset()
        for _ in range(self._rng.randint(0, self.noop_max + 1)):
            frame, _, term, trunc, info = self._env.step(0)
            if term or trunc:
                frame, _ = self._env.reset()
        self._lives = self._env.unwrapped.ale.lives() if hasattr(self._env.unwrapped, "ale") else 0
        self._t = 0
        return self._obs(frame)

    def step(self, action: int):
        total_reward = 0.0
        frames = []
        term = trunc = False
        for i in range(self.frame_skip):
            frame, r, term, trunc, info = self._env.step(int(action))
            total_reward += float(r)
            if i >= self.frame_skip - 2:
                frames.append(frame)
            if term or trunc:
                break
        obs_frame = np.max(np.stack(frames), axis=0) if len(frames) > 1 else frames[-1]
        self._t += 1
        done = term or trunc or self._t >= self.max_episode_steps
        if self.episode_life and hasattr(self._env.unwrapped, "ale"):
            lives = self._env.unwrapped.ale.lives()
            if 0 < lives < self._lives:
                done = True
            self._lives = lives
        reward = float(np.clip(total_reward, -1, 1)) if self.clip_rewards else total_reward
        return self._obs(obs_frame), reward, done, total_reward


class AtariVecEnv:
    """Batched interface matching HostVecEnv (workers/host_collector.py)."""

    def __init__(self, env_id: str, num_envs: int, seed: int = 0, env_kwargs=None):
        kw = dict(env_kwargs or {})
        self.num_envs = num_envs
        self._envs = [AtariEnv(env_id, seed=seed + i, **kw) for i in range(num_envs)]
        self.action_space_size = self._envs[0].action_space_size
        self.observation_shape = self._envs[0].observation_shape
        self.continuous = False

    def reset_all(self):
        obs = np.stack([e.reset() for e in self._envs])
        legal = np.ones((self.num_envs, self.action_space_size), bool)
        return obs, legal, np.full((self.num_envs,), -1, np.int64)

    def step(self, actions):
        obs, rewards, dones = [], [], []
        for e, a in zip(self._envs, actions):
            o, r, d, _ = e.step(int(a))
            if d:
                o = e.reset()
            obs.append(o)
            rewards.append(r)
            dones.append(d)
        legal = np.ones((self.num_envs, self.action_space_size), bool)
        return (
            np.stack(obs),
            np.asarray(rewards, np.float32),
            np.asarray(dones, bool),
            legal,
            np.full((self.num_envs,), -1, np.int64),
        )
