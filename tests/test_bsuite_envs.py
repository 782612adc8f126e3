"""bsuite-class probe envs (envs/bsuite_like.py): rule checks."""
import jax
import jax.numpy as jnp
import numpy as np

from lightzero_tpu.envs.bsuite_like import DeepSeaEnv, CatchEnv


def test_deep_sea_treasure_path():
    env = DeepSeaEnv(size=5)
    rng = jax.random.PRNGKey(0)
    s, obs = env.reset(rng)
    assert obs.shape == (25,) and float(obs[0]) == 1.0
    total = 0.0
    for i in range(5):
        out = jax.jit(env.step)(s, jnp.int32(1), rng)  # always right
        total += float(out.reward)
        s = out.state
    assert bool(out.done)
    assert abs(total - (1.0 - 5 * env.move_cost)) < 1e-6
    # all-left path: no treasure, no move cost
    s, _ = env.reset(rng)
    total = 0.0
    for i in range(5):
        out = jax.jit(env.step)(s, jnp.int32(0), rng)
        total += float(out.reward)
        s = out.state
    assert bool(out.done) and abs(total) < 1e-9


def test_deep_sea_requires_full_right_path():
    env = DeepSeaEnv(size=4)
    rng = jax.random.PRNGKey(1)
    s, _ = env.reset(rng)
    acts = [1, 1, 0, 1]  # one wrong move -> no treasure
    total = 0.0
    for a in acts:
        out = jax.jit(env.step)(s, jnp.int32(a), rng)
        total += float(out.reward)
        s = out.state
    assert bool(out.done) and total < 0


def test_catch_catches_and_misses():
    env = CatchEnv(rows=6, cols=5)
    rng = jax.random.PRNGKey(3)
    s, obs = env.reset(rng)
    assert obs.shape == (30,)
    ball_col = int(s.ball_col)
    step = jax.jit(env.step)
    # steer toward the ball column
    for i in range(5):
        a = 1 + np.sign(ball_col - int(s.paddle))
        out = step(s, jnp.int32(int(a)), rng)
        s = out.state
        if bool(out.done):
            break
    assert bool(out.done) and float(out.reward) == 1.0
    # now deliberately miss
    s, _ = env.reset(jax.random.PRNGKey(4))
    ball_col = int(s.ball_col)
    for i in range(5):
        away = 1 + (1 if int(s.paddle) <= ball_col else -1) * (-1)
        a = 0 if ball_col >= int(s.paddle) else 2
        out = step(s, jnp.int32(int(a)), rng)
        s = out.state
        if bool(out.done):
            break
    assert bool(out.done) and float(out.reward) == -1.0
