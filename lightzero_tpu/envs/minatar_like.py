"""MinAtar-class image envs, pure JAX: asterix / freeway / space-invaders /
seaquest analogues.

ALE is unavailable in this image (zoo/atari gates on ale_py), so together
with ``breakout_grid`` these stand in for the reference's Atari benchmark
rows (reference stack: zoo/atari/envs/atari_lightzero_env.py + the
DeepMind wrapper pipeline, atari_wrappers.py:35-48): 10×10 multi-channel
image observations exercising the conv representation/dynamics path
(RepresentationNetwork role, lzero/model/common.py:705) with
frame-dependent credit assignment — while stepping entirely on device
inside the fused collector (no host env workers).

All dynamics are own designs inspired by the public MinAtar suite's game
structure (player/entity lanes, cadenced movement, event rewards); shapes
are static and every step is a pure jittable function.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from lightzero_tpu.envs.base import EnvStep, JaxEnv
from lightzero_tpu.utils import ENV_REGISTRY

S = 10  # grid side


def _one(grid_r, grid_c, val=1.0):
    return jnp.zeros((S, S)).at[grid_r, grid_c].set(val)


# =========================================================== Asterix-like
class AsterixState(NamedTuple):
    pr: jnp.ndarray  # player row
    pc: jnp.ndarray  # player col
    active: jnp.ndarray  # (8,) bool — entity alive in lane i (rows 1..8)
    col: jnp.ndarray  # (8,) int32 entity column
    right: jnp.ndarray  # (8,) bool moving right
    gold: jnp.ndarray  # (8,) bool treasure (else enemy)
    cadence: jnp.ndarray  # () int32 move-every-k counter
    done: jnp.ndarray
    t: jnp.ndarray


@ENV_REGISTRY.register("asterix_grid")
class AsterixGridEnv(JaxEnv):
    """Lanes of left/right-moving entities; collect gold (+1), avoid
    enemies (death). Actions: 0 noop, 1 up, 2 down, 3 left, 4 right."""

    num_players = 1
    observation_shape = (S, S, 4)
    action_space_size = 5

    def __init__(self, max_steps: int = 500, spawn_prob: float = 0.2,
                 move_every: int = 3):
        self.max_steps = max_steps
        self.spawn_prob = float(spawn_prob)
        self.move_every = int(move_every)

    def observation(self, s: AsterixState) -> jnp.ndarray:
        player = _one(s.pr, s.pc)
        lane_rows = jnp.arange(1, 9)
        act = s.active.astype(jnp.float32)
        enemy = jnp.zeros((S, S)).at[lane_rows, s.col].add(act * (~s.gold))
        gold = jnp.zeros((S, S)).at[lane_rows, s.col].add(act * s.gold)
        direc = jnp.zeros((S, S)).at[lane_rows, s.col].add(
            act * jnp.where(s.right, 1.0, 0.5)
        )
        return jnp.stack([player, enemy, gold, direc], axis=-1)

    def reset(self, rng: jax.Array) -> Tuple[AsterixState, jnp.ndarray]:
        z = jnp.zeros((), jnp.int32)
        s = AsterixState(
            pr=jnp.asarray(S // 2, jnp.int32), pc=jnp.asarray(S // 2, jnp.int32),
            active=jnp.zeros((8,), bool), col=jnp.zeros((8,), jnp.int32),
            right=jnp.zeros((8,), bool), gold=jnp.zeros((8,), bool),
            cadence=z, done=jnp.zeros((), bool), t=z,
        )
        return s, self.observation(s)

    def legal_mask(self, state: AsterixState) -> jnp.ndarray:
        return jnp.ones((5,), bool)

    def step(self, s: AsterixState, action: jnp.ndarray, rng: jax.Array) -> EnvStep:
        r_spawn, r_dir, r_gold, r_reset = jax.random.split(rng, 4)
        # player move (stays on rows 1..8 so lanes always threaten)
        pr = jnp.clip(s.pr + jnp.where(action == 1, -1, 0) + jnp.where(action == 2, 1, 0), 1, 8)
        pc = jnp.clip(s.pc + jnp.where(action == 3, -1, 0) + jnp.where(action == 4, 1, 0), 0, S - 1)
        # entity movement every `move_every` steps
        cadence = (s.cadence + 1) % self.move_every
        do_move = cadence == 0
        ncol = s.col + jnp.where(s.right, 1, -1) * jnp.where(do_move & s.active, 1, 0)
        off = (ncol < 0) | (ncol >= S)
        active = s.active & ~off
        ncol = jnp.clip(ncol, 0, S - 1)
        # spawns into empty lanes (one lane per step at most)
        lane = jax.random.randint(r_spawn, (), 0, 8)
        spawn = (jax.random.uniform(r_spawn) < self.spawn_prob) & ~active[lane]
        right = jax.random.bernoulli(r_dir)
        is_gold = jax.random.bernoulli(r_gold, 0.3)
        active = active.at[lane].set(active[lane] | spawn)
        ncol = ncol.at[lane].set(jnp.where(spawn, jnp.where(right, 0, S - 1), ncol[lane]))
        nright = s.right.at[lane].set(jnp.where(spawn, right, s.right[lane]))
        ngold = s.gold.at[lane].set(jnp.where(spawn, is_gold, s.gold[lane]))
        # collisions at the player cell
        lane_rows = jnp.arange(1, 9)
        hit = active & (lane_rows == pr) & (ncol == pc)
        reward = jnp.sum(jnp.where(hit & ngold, 1.0, 0.0)).astype(jnp.float32)
        killed = jnp.any(hit & ~ngold)
        active = active & ~hit  # consumed either way
        t = s.t + 1
        done = killed | (t >= self.max_steps)
        ns = AsterixState(pr, pc, active, ncol, nright, ngold, cadence,
                          jnp.zeros((), bool), t)
        reset_s, reset_obs = self.reset(r_reset)
        out = jax.tree_util.tree_map(lambda a, b: jnp.where(done, a, b), reset_s, ns)
        return EnvStep(
            state=out,
            obs=jnp.where(done, reset_obs, self.observation(ns)),
            reward=reward,
            done=done,
            legal_mask=jnp.ones((5,), bool),
            to_play=jnp.full((), -1, jnp.int32),
        )


# =========================================================== Freeway-like
class FreewayState(NamedTuple):
    chicken: jnp.ndarray  # () int32 row (col fixed center)
    car_col: jnp.ndarray  # (8,) int32
    car_speed: jnp.ndarray  # (8,) int32 move every k steps (1..3)
    car_right: jnp.ndarray  # (8,) bool
    timer: jnp.ndarray  # (8,) int32 per-car cadence counters
    done: jnp.ndarray
    t: jnp.ndarray


@ENV_REGISTRY.register("freeway_grid")
class FreewayGridEnv(JaxEnv):
    """Cross 8 lanes of cadenced traffic bottom→top: +1 per crossing, a hit
    sends the chicken back to the start. Actions: 0 noop, 1 up, 2 down."""

    num_players = 1
    observation_shape = (S, S, 3)
    action_space_size = 3

    def __init__(self, max_steps: int = 250):
        self.max_steps = max_steps
        self.col = S // 2

    def observation(self, s: FreewayState) -> jnp.ndarray:
        chicken = _one(s.chicken, jnp.asarray(self.col))
        lane_rows = jnp.arange(1, 9)
        cars = jnp.zeros((S, S)).at[lane_rows, s.car_col].set(1.0)
        speed = jnp.zeros((S, S)).at[lane_rows, s.car_col].set(
            s.car_speed.astype(jnp.float32) / 3.0
        )
        return jnp.stack([chicken, cars, speed], axis=-1)

    def reset(self, rng: jax.Array) -> Tuple[FreewayState, jnp.ndarray]:
        r1, r2, r3 = jax.random.split(rng, 3)
        s = FreewayState(
            chicken=jnp.asarray(S - 1, jnp.int32),
            car_col=jax.random.randint(r1, (8,), 0, S),
            car_speed=jax.random.randint(r2, (8,), 1, 4),
            car_right=jax.random.bernoulli(r3, 0.5, (8,)),
            timer=jnp.zeros((8,), jnp.int32),
            done=jnp.zeros((), bool),
            t=jnp.zeros((), jnp.int32),
        )
        return s, self.observation(s)

    def legal_mask(self, state: FreewayState) -> jnp.ndarray:
        return jnp.ones((3,), bool)

    def step(self, s: FreewayState, action: jnp.ndarray, rng: jax.Array) -> EnvStep:
        chicken = jnp.clip(
            s.chicken + jnp.where(action == 1, -1, 0) + jnp.where(action == 2, 1, 0),
            0, S - 1,
        )
        timer = s.timer + 1
        move = timer >= s.car_speed
        timer = jnp.where(move, 0, timer)
        car_col = (s.car_col + jnp.where(s.car_right, 1, -1) * move) % S
        lane_rows = jnp.arange(1, 9)
        hit = jnp.any((lane_rows == chicken) & (car_col == self.col))
        crossed = chicken == 0
        reward = jnp.where(crossed, 1.0, 0.0).astype(jnp.float32)
        chicken = jnp.where(hit | crossed, S - 1, chicken)
        t = s.t + 1
        done = t >= self.max_steps
        ns = FreewayState(chicken, car_col, s.car_speed, s.car_right, timer,
                          jnp.zeros((), bool), t)
        reset_s, reset_obs = self.reset(rng)
        out = jax.tree_util.tree_map(lambda a, b: jnp.where(done, a, b), reset_s, ns)
        return EnvStep(
            state=out,
            obs=jnp.where(done, reset_obs, self.observation(ns)),
            reward=reward,
            done=done,
            legal_mask=jnp.ones((3,), bool),
            to_play=jnp.full((), -1, jnp.int32),
            truncated=done,  # freeway ends only by time limit
        )


# ===================================================== SpaceInvaders-like
N_AL_R, N_AL_C = 3, 6


class InvadersState(NamedTuple):
    pc: jnp.ndarray  # player column (bottom row)
    aliens: jnp.ndarray  # (3, 6) bool
    a_row: jnp.ndarray  # () int32 top row of the alien block
    a_col: jnp.ndarray  # () int32 left col of the alien block
    a_right: jnp.ndarray  # () bool block direction
    cadence: jnp.ndarray  # () int32
    pb_r: jnp.ndarray  # player bullet (−1 = none)
    pb_c: jnp.ndarray
    eb_r: jnp.ndarray  # enemy bullet (−1 = none)
    eb_c: jnp.ndarray
    done: jnp.ndarray
    t: jnp.ndarray


@ENV_REGISTRY.register("space_invaders_grid")
class SpaceInvadersGridEnv(JaxEnv):
    """A 3×6 alien block sweeps and descends; shoot it down (+1/alien)
    before it reaches the ground or you are shot. Actions: 0 noop, 1 left,
    2 right, 3 fire."""

    num_players = 1
    observation_shape = (S, S, 4)
    action_space_size = 4

    def __init__(self, max_steps: int = 400, move_every: int = 3):
        self.max_steps = max_steps
        self.move_every = int(move_every)

    def observation(self, s: InvadersState) -> jnp.ndarray:
        player = _one(jnp.asarray(S - 1), s.pc)
        rr = s.a_row + jnp.arange(N_AL_R)[:, None]
        cc = s.a_col + jnp.arange(N_AL_C)[None, :]
        aliens = jnp.zeros((S, S)).at[
            jnp.clip(rr, 0, S - 1), jnp.clip(cc, 0, S - 1)
        ].add(s.aliens.astype(jnp.float32))
        pb = jnp.where(
            s.pb_r >= 0, _one(jnp.clip(s.pb_r, 0, S - 1), s.pb_c), jnp.zeros((S, S))
        )
        eb = jnp.where(
            s.eb_r >= 0, _one(jnp.clip(s.eb_r, 0, S - 1), s.eb_c), jnp.zeros((S, S))
        )
        return jnp.stack([player, aliens, pb, eb], axis=-1)

    def reset(self, rng: jax.Array) -> Tuple[InvadersState, jnp.ndarray]:
        z = jnp.zeros((), jnp.int32)
        neg = jnp.full((), -1, jnp.int32)
        s = InvadersState(
            pc=jnp.asarray(S // 2, jnp.int32),
            aliens=jnp.ones((N_AL_R, N_AL_C), bool),
            a_row=jnp.asarray(0, jnp.int32), a_col=jnp.asarray(1, jnp.int32),
            a_right=jnp.ones((), bool), cadence=z,
            pb_r=neg, pb_c=z, eb_r=neg, eb_c=z,
            done=jnp.zeros((), bool), t=z,
        )
        return s, self.observation(s)

    def legal_mask(self, state: InvadersState) -> jnp.ndarray:
        return jnp.ones((4,), bool)

    def step(self, s: InvadersState, action: jnp.ndarray, rng: jax.Array) -> EnvStep:
        pc = jnp.clip(s.pc + jnp.where(action == 1, -1, 0) + jnp.where(action == 2, 1, 0), 0, S - 1)
        # player bullet: fire if none in flight; moves up 1/step
        fire = (action == 3) & (s.pb_r < 0)
        pb_r = jnp.where(fire, S - 2, s.pb_r - jnp.where(s.pb_r >= 0, 1, 0))
        pb_c = jnp.where(fire, pc, s.pb_c)
        # alien block sweep/descend on cadence
        cadence = (s.cadence + 1) % self.move_every
        do_move = cadence == 0
        ncols = jnp.sum(jnp.any(s.aliens, axis=0))
        # live-column extent for wall bounce
        col_any = jnp.any(s.aliens, axis=0)
        first_live = jnp.argmax(col_any)
        last_live = N_AL_C - 1 - jnp.argmax(col_any[::-1])
        left_edge = s.a_col + first_live
        right_edge = s.a_col + last_live
        at_wall = jnp.where(s.a_right, right_edge >= S - 1, left_edge <= 0)
        bounce = do_move & at_wall & (ncols > 0)
        a_right = jnp.where(bounce, ~s.a_right, s.a_right)
        a_row = s.a_row + jnp.where(bounce, 1, 0)
        a_col = s.a_col + jnp.where(do_move & ~bounce, jnp.where(a_right, 1, -1), 0)
        # player bullet vs aliens
        rel_r = pb_r - a_row
        rel_c = pb_c - a_col
        in_block = (
            (pb_r >= 0) & (rel_r >= 0) & (rel_r < N_AL_R) & (rel_c >= 0) & (rel_c < N_AL_C)
        )
        rr = jnp.clip(rel_r, 0, N_AL_R - 1)
        rc = jnp.clip(rel_c, 0, N_AL_C - 1)
        hit_alien = in_block & s.aliens[rr, rc]
        aliens = s.aliens.at[rr, rc].set(s.aliens[rr, rc] & ~hit_alien)
        pb_r = jnp.where(hit_alien | (pb_r < 0), jnp.full((), -1, jnp.int32), pb_r)
        reward = jnp.where(hit_alien, 1.0, 0.0).astype(jnp.float32)
        # enemy bullet: lowest alien in a random live column fires when free
        r_fire, r_col, r_reset = jax.random.split(rng, 3)
        col_pick = jax.random.randint(r_col, (), 0, N_AL_C)
        col_live = jnp.any(aliens[:, col_pick])
        lowest = N_AL_R - 1 - jnp.argmax(aliens[::-1, col_pick])
        e_fire = (s.eb_r < 0) & col_live & jax.random.bernoulli(r_fire, 0.3)
        eb_r = jnp.where(e_fire, a_row + lowest + 1, s.eb_r + jnp.where(s.eb_r >= 0, 1, 0))
        eb_c = jnp.where(e_fire, a_col + col_pick, s.eb_c)
        shot = (eb_r == S - 1) & (eb_c == pc)
        eb_r = jnp.where(eb_r >= S, jnp.full((), -1, jnp.int32), eb_r)
        landed = jnp.any(aliens) & (a_row + N_AL_R - 1 >= S - 1)
        cleared = ~jnp.any(aliens)
        t = s.t + 1
        done = shot | landed | cleared | (t >= self.max_steps)
        ns = InvadersState(pc, aliens, a_row, a_col, a_right, cadence,
                           pb_r, pb_c, eb_r, eb_c, jnp.zeros((), bool), t)
        reset_s, reset_obs = self.reset(r_reset)
        out = jax.tree_util.tree_map(lambda a, b: jnp.where(done, a, b), reset_s, ns)
        return EnvStep(
            state=out,
            obs=jnp.where(done, reset_obs, self.observation(ns)),
            reward=reward,
            done=done,
            legal_mask=jnp.ones((4,), bool),
            to_play=jnp.full((), -1, jnp.int32),
        )


# ========================================================== Seaquest-like
class SeaquestState(NamedTuple):
    pr: jnp.ndarray  # sub row
    pc: jnp.ndarray  # sub col
    oxygen: jnp.ndarray  # () int32 remaining
    active: jnp.ndarray  # (6,) bool fish in lanes (rows 2..7)
    col: jnp.ndarray  # (6,)
    right: jnp.ndarray  # (6,) bool
    cadence: jnp.ndarray
    done: jnp.ndarray
    t: jnp.ndarray


@ENV_REGISTRY.register("seaquest_grid")
class SeaquestGridEnv(JaxEnv):
    """Dive among fish lanes: ram fish head-on for +1 (the torpedo role),
    touching them sideways kills; surface (row 0) to refill oxygen, running
    out kills. Actions: 0 noop, 1 up, 2 down, 3 left, 4 right."""

    num_players = 1
    observation_shape = (S, S, 4)
    action_space_size = 5

    def __init__(self, max_steps: int = 400, oxygen_max: int = 60,
                 spawn_prob: float = 0.25, move_every: int = 2):
        self.max_steps = max_steps
        self.oxygen_max = int(oxygen_max)
        self.spawn_prob = float(spawn_prob)
        self.move_every = int(move_every)

    def observation(self, s: SeaquestState) -> jnp.ndarray:
        sub = _one(s.pr, s.pc)
        lane_rows = jnp.arange(2, 8)
        act = s.active.astype(jnp.float32)
        fish = jnp.zeros((S, S)).at[lane_rows, s.col].add(act)
        direc = jnp.zeros((S, S)).at[lane_rows, s.col].add(
            act * jnp.where(s.right, 1.0, 0.5)
        )
        oxy = jnp.full((S, S), s.oxygen / self.oxygen_max, jnp.float32)
        return jnp.stack([sub, fish, direc, oxy], axis=-1)

    def reset(self, rng: jax.Array) -> Tuple[SeaquestState, jnp.ndarray]:
        z = jnp.zeros((), jnp.int32)
        s = SeaquestState(
            pr=jnp.asarray(0, jnp.int32), pc=jnp.asarray(S // 2, jnp.int32),
            oxygen=jnp.asarray(self.oxygen_max, jnp.int32),
            active=jnp.zeros((6,), bool), col=jnp.zeros((6,), jnp.int32),
            right=jnp.zeros((6,), bool), cadence=z,
            done=jnp.zeros((), bool), t=z,
        )
        return s, self.observation(s)

    def legal_mask(self, state: SeaquestState) -> jnp.ndarray:
        return jnp.ones((5,), bool)

    def step(self, s: SeaquestState, action: jnp.ndarray, rng: jax.Array) -> EnvStep:
        r_spawn, r_dir, r_reset = jax.random.split(rng, 3)
        dr = jnp.where(action == 1, -1, 0) + jnp.where(action == 2, 1, 0)
        dc = jnp.where(action == 3, -1, 0) + jnp.where(action == 4, 1, 0)
        pr = jnp.clip(s.pr + dr, 0, S - 1)
        pc = jnp.clip(s.pc + dc, 0, S - 1)
        surfaced = pr == 0
        oxygen = jnp.where(surfaced, self.oxygen_max, s.oxygen - 1)
        # fish movement on cadence
        cadence = (s.cadence + 1) % self.move_every
        do_move = cadence == 0
        ncol = s.col + jnp.where(s.right, 1, -1) * jnp.where(do_move & s.active, 1, 0)
        off = (ncol < 0) | (ncol >= S)
        active = s.active & ~off
        ncol = jnp.clip(ncol, 0, S - 1)
        # spawn
        lane = jax.random.randint(r_spawn, (), 0, 6)
        spawn = (jax.random.uniform(r_spawn) < self.spawn_prob) & ~active[lane]
        right = jax.random.bernoulli(r_dir)
        active = active.at[lane].set(active[lane] | spawn)
        ncol = ncol.at[lane].set(jnp.where(spawn, jnp.where(right, 0, S - 1), ncol[lane]))
        nright = s.right.at[lane].set(jnp.where(spawn, right, s.right[lane]))
        # contact: head-on (moving horizontally INTO the fish) = catch +1;
        # any other contact = death
        lane_rows = jnp.arange(2, 8)
        contact = active & (lane_rows == pr) & (ncol == pc)
        head_on = contact & (
            ((dc > 0) & ~nright) | ((dc < 0) & nright)
        )
        reward = jnp.sum(jnp.where(head_on, 1.0, 0.0)).astype(jnp.float32)
        killed = jnp.any(contact & ~head_on) | (oxygen <= 0)
        active = active & ~contact
        t = s.t + 1
        done = killed | (t >= self.max_steps)
        ns = SeaquestState(pr, pc, oxygen, active, ncol, nright, cadence,
                           jnp.zeros((), bool), t)
        reset_s, reset_obs = self.reset(r_reset)
        out = jax.tree_util.tree_map(lambda a, b: jnp.where(done, a, b), reset_s, ns)
        return EnvStep(
            state=out,
            obs=jnp.where(done, reset_obs, self.observation(ns)),
            reward=reward,
            done=done,
            legal_mask=jnp.ones((5,), bool),
            to_play=jnp.full((), -1, jnp.int32),
        )
