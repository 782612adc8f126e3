"""Pooltool billiards "sum to three" host env adapter (gated on
``pooltool``).

Capability-parity rebuild of reference zoo/pooltool/sum_to_three/envs/
sum_to_three_env.py: the agent strikes the cue ball with a continuous
(V0 speed, cut angle) action; reward 1 when the number of ball-ball and
ball-cushion collisions sums to three. Observations are the (x, y)
coordinates of both balls (COORDINATE observation type). Batched eagerly
on the host (HostVecEnv interface).

pooltool is absent from this image → gated adapter (is_available()
False); configs compile, construction raises with a clear message.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def is_available() -> bool:
    try:
        import pooltool  # noqa: F401

        return True
    except Exception:
        return False


# action bounds from the reference config (sum_to_three: V0 in [0.3, 3],
# angle in [-70, 70] degrees)
V0_BOUNDS = (0.3, 3.0)
ANGLE_BOUNDS = (-70.0, 70.0)


class SumToThreeVecEnv:
    """Eager host-batched pooltool sum-to-three (reset_all/step)."""

    def __init__(self, num_envs: int = 1, seed: int = 0, episode_length: int = 10):
        if not is_available():
            raise ImportError(
                "pooltool is not installed in this image; SumToThreeVecEnv is "
                "a gated adapter (zoo/pooltool configs compile but cannot run)"
            )
        import pooltool as pt

        self._pt = pt
        self.num_envs = num_envs
        self.episode_length = episode_length
        self.action_space_size = 2  # (V0, cut angle)
        self.continuous = True
        self.observation_shape = 4  # cue (x, y) + object (x, y)
        self._rng = np.random.RandomState(seed)
        self._systems = [self._new_system() for _ in range(num_envs)]
        self._steps = np.zeros(num_envs, np.int64)

    def _new_system(self):
        pt = self._pt
        table = pt.Table.default()
        balls = {
            "cue": pt.Ball.create("cue", xy=(table.w * 0.5, table.l * 0.25)),
            "object": pt.Ball.create("object", xy=(table.w * 0.5, table.l * 0.75)),
        }
        return pt.System(table=table, balls=balls, cue=pt.Cue(cue_ball_id="cue"))

    def _obs_one(self, i: int) -> np.ndarray:
        s = self._systems[i]
        c = s.balls["cue"].state.rvw[0]
        o = s.balls["object"].state.rvw[0]
        return np.asarray([c[0], c[1], o[0], o[1]], np.float32)

    def reset_all(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        self._systems = [self._new_system() for _ in range(self.num_envs)]
        self._steps[:] = 0
        B = self.num_envs
        obs = np.stack([self._obs_one(i) for i in range(B)])
        return obs, np.ones((B, 2), bool), np.full((B,), -1, np.int64)

    def step(self, actions: np.ndarray):
        pt = self._pt
        obs, rewards, dones = [], [], []
        for i in range(self.num_envs):
            a = np.clip(np.asarray(actions[i], np.float32), -1, 1)
            V0 = V0_BOUNDS[0] + (a[0] + 1) * 0.5 * (V0_BOUNDS[1] - V0_BOUNDS[0])
            angle = ANGLE_BOUNDS[0] + (a[1] + 1) * 0.5 * (ANGLE_BOUNDS[1] - ANGLE_BOUNDS[0])
            s = self._systems[i]
            s.cue.set_state(V0=float(V0), phi=pt.aim.at_ball(s, "object", cut=float(angle)))
            pt.simulate(s, inplace=True)
            # count ball-ball + ball-cushion collision events (reward 1 iff == 3)
            n_bb = len(pt.events.filter_type(s.events, pt.EventType.BALL_BALL))
            n_bc = len(
                pt.events.filter_type(s.events, pt.EventType.BALL_LINEAR_CUSHION)
            ) + len(pt.events.filter_type(s.events, pt.EventType.BALL_CIRCULAR_CUSHION))
            r = 1.0 if (n_bb + n_bc) == 3 else 0.0
            s.stop_balls()
            self._steps[i] += 1
            d = bool(self._steps[i] >= self.episode_length)
            if d:
                self._systems[i] = self._new_system()
                self._steps[i] = 0
            obs.append(self._obs_one(i))
            rewards.append(r)
            dones.append(d)
        B = self.num_envs
        return (
            np.stack(obs),
            np.asarray(rewards, np.float32),
            np.asarray(dones, bool),
            np.ones((B, 2), bool),
            np.full((B,), -1, np.int64),
        )
