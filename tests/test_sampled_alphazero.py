"""Sampled AlphaZero tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.unittest


def test_gumbel_top_k_mask():
    from lightzero_tpu.policy.sampled_alphazero import gumbel_top_k_mask

    logits = jnp.zeros((4, 10))
    legal = jnp.ones((4, 10), bool)
    m = gumbel_top_k_mask(jax.random.PRNGKey(0), logits, legal, 3)
    assert (np.asarray(m).sum(-1) == 3).all()
    # never selects illegal actions
    legal2 = legal.at[:, :8].set(False)  # only 2 legal
    m2 = gumbel_top_k_mask(jax.random.PRNGKey(1), logits, legal2, 3)
    assert (np.asarray(m2) == np.asarray(legal2)).all()
    # heavily-favored action is almost always included
    logits3 = logits.at[:, 5].set(10.0)
    hits = 0
    for i in range(20):
        m3 = gumbel_top_k_mask(jax.random.PRNGKey(i), logits3, legal, 3)
        hits += int(np.asarray(m3)[:, 5].sum())
    assert hits >= 75  # 4 rows x 20 trials, ~always


def test_sampled_az_collect_on_gomoku():
    from lightzero_tpu.envs.board.gomoku import GomokuEnv
    from lightzero_tpu.policy.sampled_alphazero import SampledAlphaZeroPolicy

    env = GomokuEnv(board_size=6, n_in_row=4, battle_mode="self_play_mode")
    cfg = SampledAlphaZeroPolicy.default_config()
    cfg.model.observation_shape = (6, 6, 3)
    cfg.model.action_space_size = 36
    cfg.num_simulations = 10
    cfg.num_of_sampled_actions = 6
    policy = SampledAlphaZeroPolicy(cfg, env)
    params = policy.model.init_params(jax.random.PRNGKey(0))
    state = jax.vmap(lambda _: env.init_state())(jnp.arange(2))
    out = policy.forward_collect(params, jax.random.PRNGKey(1), state)
    vc = np.asarray(out["visit_counts"])
    assert vc.sum() == 20
    # visits concentrated on <= K actions per root
    assert ((vc > 0).sum(-1) <= 6).all()
