"""Grid Breakout: a MinAtar-class image env, pure JAX.

ALE is unavailable in this image (zoo/atari gates on ale_py), so this env
stands in for the reference's Atari benchmark row: a 10×10, 4-channel
Breakout with the same role MinAtar plays for DQN-class papers — it
exercises the conv representation/dynamics path, frame-dependent credit
assignment, and non-trivial exploration, while stepping entirely on device
inside the fused collector.

Dynamics (own design, minatar-inspired): a paddle on the bottom row moves
left/right/stays; one ball travels diagonally, bouncing off walls, bricks
and the paddle; 3 rows of bricks pay +1 when hit; clearing all bricks
respawns them (score continues); the episode ends when the ball exits past
the paddle or at ``max_steps``.

Observation (10, 10, 4) float32: [paddle, ball, ball-trail, bricks].
Actions: 0 noop, 1 left, 2 right.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from lightzero_tpu.envs.base import EnvStep, JaxEnv
from lightzero_tpu.utils import ENV_REGISTRY

S = 10
BRICK_ROWS = 3


class BreakoutState(NamedTuple):
    paddle: jnp.ndarray  # () int32 column
    ball_r: jnp.ndarray  # () int32
    ball_c: jnp.ndarray  # () int32
    dr: jnp.ndarray  # () int32 ±1
    dc: jnp.ndarray  # () int32 ±1
    last_r: jnp.ndarray
    last_c: jnp.ndarray
    bricks: jnp.ndarray  # (BRICK_ROWS, S) bool
    done: jnp.ndarray
    t: jnp.ndarray


@ENV_REGISTRY.register("breakout_grid")
class BreakoutGridEnv(JaxEnv):
    num_players = 1
    observation_shape = (S, S, 4)
    action_space_size = 3

    def __init__(self, max_steps: int = 500):
        self.max_steps = max_steps

    def observation(self, s: BreakoutState) -> jnp.ndarray:
        paddle = jnp.zeros((S, S)).at[S - 1, s.paddle].set(1.0)
        ball = jnp.zeros((S, S)).at[s.ball_r, s.ball_c].set(1.0)
        trail = jnp.zeros((S, S)).at[s.last_r, s.last_c].set(1.0)
        bricks = jnp.zeros((S, S)).at[1 : 1 + BRICK_ROWS].set(s.bricks.astype(jnp.float32))
        return jnp.stack([paddle, ball, trail, bricks], axis=-1)

    def legal_mask(self, s: BreakoutState) -> jnp.ndarray:
        return jnp.ones((3,), bool)

    def reset(self, rng: jax.Array) -> Tuple[BreakoutState, jnp.ndarray]:
        c_rng, d_rng = jax.random.split(rng)
        c = jax.random.randint(c_rng, (), 0, S)
        dc = jnp.where(jax.random.bernoulli(d_rng), 1, -1).astype(jnp.int32)
        s = BreakoutState(
            paddle=jnp.asarray(S // 2, jnp.int32),
            ball_r=jnp.asarray(BRICK_ROWS + 1, jnp.int32),
            ball_c=c.astype(jnp.int32),
            dr=jnp.asarray(1, jnp.int32),
            dc=dc,
            last_r=jnp.asarray(BRICK_ROWS + 1, jnp.int32),
            last_c=c.astype(jnp.int32),
            bricks=jnp.ones((BRICK_ROWS, S), bool),
            done=jnp.zeros((), bool),
            t=jnp.zeros((), jnp.int32),
        )
        return s, self.observation(s)

    def step(self, s: BreakoutState, action: jnp.ndarray, rng: jax.Array) -> EnvStep:
        paddle = jnp.clip(
            s.paddle + jnp.where(action == 1, -1, jnp.where(action == 2, 1, 0)), 0, S - 1
        )
        # wall bounces
        dc = jnp.where((s.ball_c + s.dc < 0) | (s.ball_c + s.dc >= S), -s.dc, s.dc)
        dr = jnp.where(s.ball_r + s.dr < 0, -s.dr, s.dr)
        nr = s.ball_r + dr
        nc = s.ball_c + dc
        # brick hit: entering a brick cell pays +1, removes it, reflects dr
        in_bricks = (nr >= 1) & (nr < 1 + BRICK_ROWS)
        br = jnp.clip(nr - 1, 0, BRICK_ROWS - 1)
        hit = in_bricks & s.bricks[br, nc]
        bricks = s.bricks.at[br, nc].set(jnp.where(hit, False, s.bricks[br, nc]))
        reward = hit.astype(jnp.float32)
        dr = jnp.where(hit, -dr, dr)
        nr = jnp.where(hit, s.ball_r + dr, nr)
        # paddle bounce on the bottom row
        at_bottom = nr >= S - 1
        caught = at_bottom & (nc == paddle)
        dr = jnp.where(caught, -jnp.abs(dr), dr)
        nr = jnp.where(caught, S - 2, nr)
        lost = at_bottom & ~caught
        # respawn bricks when cleared
        cleared = ~jnp.any(bricks)
        bricks = jnp.where(cleared, jnp.ones_like(bricks), bricks)
        t = s.t + 1
        truncated = t >= self.max_steps
        done = lost | truncated
        ns = BreakoutState(
            paddle=paddle,
            ball_r=jnp.clip(nr, 0, S - 1),
            ball_c=nc,
            dr=dr,
            dc=dc,
            last_r=s.ball_r,
            last_c=s.ball_c,
            bricks=bricks,
            done=done,
            t=t,
        )
        reset_s, _ = self.reset(rng)
        out_s = jax.tree_util.tree_map(
            lambda a, b: jnp.where(done, a, b), reset_s, ns
        )
        return EnvStep(
            state=out_s,
            obs=self.observation(out_s),
            reward=reward,
            done=done,
            legal_mask=jnp.ones((3,), bool),
            to_play=jnp.full((), -1, jnp.int32),
            truncated=truncated & ~lost,
        )
