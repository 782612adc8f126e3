"""Grid Breakout env, memory-env latent encoder/decoder, LatentDecoder,
PadVectorObs wrapper, and the gated LLM text encoders."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [pytest.mark.unittest, pytest.mark.slow]  # compile-heavy: not in the fast tier


def test_breakout_grid_plays_and_scores():
    from lightzero_tpu.envs.breakout_grid import BreakoutGridEnv
    from lightzero_tpu.utils import ENV_REGISTRY

    assert ENV_REGISTRY.get("breakout_grid") is BreakoutGridEnv
    env = BreakoutGridEnv(max_steps=200)
    rng = jax.random.PRNGKey(0)
    s, obs = env.reset(rng)
    assert obs.shape == (10, 10, 4)
    assert float(obs[:, :, 3].sum()) == 30.0  # 3 rows of 10 bricks
    step = jax.jit(env.step)
    total_r = 0.0
    dones = 0
    for i in range(400):
        rng, a_rng, s_rng = jax.random.split(rng, 3)
        a = jax.random.randint(a_rng, (), 0, 3)
        out = step(s, a, s_rng)
        s = out.state
        total_r += float(out.reward)
        dones += int(out.done)
    assert total_r > 0  # a random paddle still hits some bricks
    assert dones >= 1  # episodes end and auto-reset


def test_breakout_grid_truncation_flag():
    from lightzero_tpu.envs.breakout_grid import BreakoutGridEnv

    env = BreakoutGridEnv(max_steps=3)
    rng = jax.random.PRNGKey(1)
    s, _ = env.reset(rng)
    step = jax.jit(env.step)
    truncated_seen = False
    for _ in range(8):
        rng, s_rng = jax.random.split(rng)
        out = step(s, jnp.asarray(0), s_rng)
        s = out.state
        if bool(out.done) and bool(out.truncated):
            truncated_seen = True
    assert truncated_seen


def test_memory_env_encoders():
    from lightzero_tpu.models.common import (
        LatentDecoder,
        LatentDecoderForMemoryEnv,
        LatentEncoderForMemoryEnv,
    )

    enc = LatentEncoderForMemoryEnv(embedding_size=64)
    obs = jnp.ones((3, 5, 5, 3))
    p = enc.init(jax.random.PRNGKey(0), obs)
    e = enc.apply(p, obs)
    assert e.shape == (3, 64)

    dec = LatentDecoderForMemoryEnv(image_shape=(5, 5, 3))
    pd = dec.init(jax.random.PRNGKey(1), e)
    rec = dec.apply(pd, e)
    assert rec.shape == (3, 5, 5, 3)
    assert (np.asarray(rec) >= 0).all() and (np.asarray(rec) <= 1).all()

    big = LatentDecoder(output_shape=(16, 16, 3), num_channels=32)
    pb = big.init(jax.random.PRNGKey(2), jnp.ones((2, 64)))
    img = big.apply(pb, jnp.ones((2, 64)))
    assert img.shape == (2, 16, 16, 3)


def test_pad_vector_obs_wrapper():
    from lightzero_tpu.envs.cartpole import CartPoleEnv
    from lightzero_tpu.envs.wrappers import PadVectorObs

    env = PadVectorObs(CartPoleEnv(), target_dim=6)
    s, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (6,)
    np.testing.assert_allclose(np.asarray(obs[4:]), 0.0)
    out = jax.jit(env.step)(s, jnp.asarray(0), jax.random.PRNGKey(1))
    assert out.obs.shape == (6,)
    assert out.legal_mask.shape == (env.action_space_size,)


def test_text_encoders_gated():
    from lightzero_tpu.models.text_encoders import HFLanguageEncoder

    if not HFLanguageEncoder.available():
        pytest.skip("no local HF weights (zero-egress image)")
    enc = HFLanguageEncoder()
    e = enc.encode(["go north", "open the door"])
    assert e.shape == (2, enc.hidden_size)


def test_discretize_action_wrapper():
    from lightzero_tpu.envs.pendulum import PendulumEnv
    from lightzero_tpu.envs.wrappers import DiscretizeAction

    env = DiscretizeAction(PendulumEnv(), bins=11)
    assert env.action_space_size == 11 and env.continuous is False
    rng = jax.random.PRNGKey(0)
    s, obs = env.reset(rng)
    assert obs.shape == (3,)
    # bin 0 -> full negative torque: parity with the env's own discrete path
    ref = PendulumEnv(discrete_bins=11)
    s2, _ = ref.reset(rng)
    r_wrap = jax.jit(env.step)(s, jnp.asarray(0), rng).reward
    r_ref = jax.jit(ref.step)(s2, jnp.asarray(0), rng).reward
    np.testing.assert_allclose(np.asarray(r_wrap), np.asarray(r_ref), atol=1e-5)
    # 2-d product binning: index = a0*bins + a1, levels over [-1, 1]
    class TwoDim(PendulumEnv):
        action_space_size = 2
        continuous = True
    env2 = DiscretizeAction(TwoDim(), bins=3)
    assert env2.action_space_size == 9
    cont = env2._to_continuous(jnp.asarray(5))  # a0=1, a1=2 -> [0.0, 1.0]
    np.testing.assert_allclose(np.asarray(cont), [0.0, 1.0], atol=1e-6)
    # non-zero bin: level k of linspace(-1,1,11) is -1 + 0.2*k (full range,
    # documented deviation from the reference's -1 + (2/n)*k levels)
    r_wrap3 = jax.jit(env.step)(s, jnp.asarray(3), rng).reward
    r_ref3 = jax.jit(ref.step)(s2, jnp.asarray(3), rng).reward
    np.testing.assert_allclose(np.asarray(r_wrap3), np.asarray(r_ref3), atol=1e-5)
    # step() must advertise the DISCRETE action width in legal_mask — the
    # collector scan carries step.legal_mask with initial carry (bins**d,)
    out = jax.jit(env.step)(s, jnp.asarray(0), rng)
    assert out.legal_mask.shape == (env.action_space_size,)


def test_discretize_action_wrapper_in_collector():
    """End-to-end: the wrapped env must survive a collector scan step
    (this is exactly where the legal_mask carry-shape bug manifested)."""
    from lightzero_tpu.envs.pendulum import PendulumEnv
    from lightzero_tpu.envs.wrappers import DiscretizeAction
    from lightzero_tpu.policy import MuZeroPolicy
    from lightzero_tpu.workers import RolloutCollector

    env = DiscretizeAction(PendulumEnv(), bins=5)
    cfg = MuZeroPolicy.default_config()
    cfg.model.observation_shape = 3
    cfg.model.action_space_size = env.action_space_size
    cfg.model.latent_state_dim = 16
    cfg.model.support_scale = 25
    cfg.num_simulations = 2
    policy = MuZeroPolicy(cfg)
    state = policy.init_train_state(jax.random.PRNGKey(0))
    coll = RolloutCollector(env, policy, 2, rollout_length=4)
    episodes, priorities, stats = coll.collect(state.params, min_steps=4)
    assert stats["steps"] >= 4
