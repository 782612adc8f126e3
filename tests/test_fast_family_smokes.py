"""Fast-tier end-to-end smokes: one 2-iteration train step per policy
family plus one micro fused-search, so the <5-min signal touches the
search/training paths of EVERY family, not just utilities (the reference's
config-as-smoke-test pattern, SURVEY.md §4.6, at unit-test size).

Sizes are microscopic (B=4, K=2, latent 8-16) to keep each family's
XLA:CPU compile in single-digit seconds.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.unittest  # deliberately NOT slow: fast-tier e2e


def _mz_batch(A=2, obs_dim=4, B=4, K=2, with_chance=False, cont_dim=None):
    from lightzero_tpu.policy.muzero import TrainBatch

    return TrainBatch(
        obs=jnp.ones((B, K + 1, obs_dim), jnp.float32),
        actions=(jnp.zeros((B, K), jnp.int32) if cont_dim is None
                 else jnp.zeros((B, K, cont_dim), jnp.float32)),
        mask=jnp.ones((B, K), jnp.float32),
        target_reward=jnp.ones((B, K), jnp.float32) * 0.5,
        target_value=jnp.ones((B, K + 1), jnp.float32),
        target_policy=jnp.full((B, K + 1, A), 1.0 / A, jnp.float32),
        weights=jnp.ones((B,), jnp.float32),
        chance=(jnp.zeros((B, K), jnp.int32) if with_chance else None),
    )


def _tiny(cfg, **model_kw):
    cfg.num_unroll_steps = 2
    cfg.td_steps = 2
    cfg.num_simulations = 3
    cfg.batch_size = 4
    for k, v in model_kw.items():
        cfg.model[k] = v
    return cfg


def _run_two_learn_iters(policy, batch):
    state = policy.init_train_state(jax.random.PRNGKey(0))
    step = jax.jit(policy._forward_learn)
    losses = []
    for _ in range(2):
        state, logs, _ = step(state, batch)
        losses.append(float(logs["total_loss"]))
    assert all(np.isfinite(l) for l in losses), losses
    assert int(state.train_iter) == 2
    return losses


def test_muzero_family_train_steps():
    """MuZero + EfficientZero + Gumbel + Stochastic on one tiny batch."""
    from lightzero_tpu.policy import MuZeroPolicy
    from lightzero_tpu.policy.efficientzero import EfficientZeroPolicy
    from lightzero_tpu.policy.gumbel_muzero import GumbelMuZeroPolicy
    from lightzero_tpu.policy.stochastic_muzero import StochasticMuZeroPolicy

    for cls, kw in [
        (MuZeroPolicy, {}),
        (EfficientZeroPolicy, dict(lstm_hidden_size=16)),
        (GumbelMuZeroPolicy, {}),
        (StochasticMuZeroPolicy, dict(chance_space_size=4)),
    ]:
        cfg = _tiny(cls.default_config(), observation_shape=4,
                    action_space_size=2, latent_state_dim=8, support_scale=5,
                    **kw)
        policy = cls(cfg)
        batch = _mz_batch(with_chance=cls is StochasticMuZeroPolicy)
        _run_two_learn_iters(policy, batch)


def test_sampled_family_train_steps():
    """Sampled MuZero + Sampled EfficientZero (continuous, Ks=3)."""
    from lightzero_tpu.policy.sampled_efficientzero import SampledEfficientZeroPolicy
    from lightzero_tpu.policy.sampled_muzero import SampledMuZeroPolicy, SampledTrainBatch

    B, K, Ks, D = 4, 2, 3, 1
    for cls, kw in [
        (SampledMuZeroPolicy, {}),
        (SampledEfficientZeroPolicy, dict(lstm_hidden_size=16)),
    ]:
        cfg = _tiny(cls.default_config(), observation_shape=3,
                    action_space_size=D, latent_state_dim=8, support_scale=5,
                    continuous_action_space=True, **kw)
        cfg.num_of_sampled_actions = Ks
        policy = cls(cfg)
        base = _mz_batch(A=Ks, obs_dim=3, cont_dim=D)
        batch = SampledTrainBatch(
            base=base, sampled_actions=jnp.zeros((B, K + 1, Ks, D), jnp.float32)
        )
        _run_two_learn_iters(policy, batch)


def test_unizero_family_train_steps():
    """UniZero + Sampled UniZero (transformer world model)."""
    from lightzero_tpu.policy.sampled_muzero import SampledTrainBatch
    from lightzero_tpu.policy.sampled_unizero import SampledUniZeroPolicy
    from lightzero_tpu.policy.unizero import UniZeroPolicy

    B, K, Ks, D = 4, 2, 3, 1
    cfg = _tiny(UniZeroPolicy.default_config(), observation_shape=4,
                action_space_size=2, embed_dim=16, num_layers=1, num_heads=2,
                max_tokens=8, support_scale=5)
    _run_two_learn_iters(UniZeroPolicy(cfg), _mz_batch())

    cfg = _tiny(SampledUniZeroPolicy.default_config(), observation_shape=3,
                action_space_size=D, embed_dim=16, num_layers=1, num_heads=2,
                max_tokens=8, support_scale=5, continuous_action_space=True)
    cfg.num_of_sampled_actions = Ks
    policy = SampledUniZeroPolicy(cfg)
    batch = SampledTrainBatch(
        base=_mz_batch(A=Ks, obs_dim=3, cont_dim=D),
        sampled_actions=jnp.zeros((B, K + 1, Ks, D), jnp.float32),
    )
    _run_two_learn_iters(policy, batch)


def test_multitask_train_step():
    """MuZero-multitask: per-task aggregation in one jitted step."""
    from lightzero_tpu.policy.multitask import MTTrainBatch, MuZeroMTPolicy

    B, K, A = 4, 2, 2
    cfg = _tiny(MuZeroMTPolicy.default_config(), observation_shape=4,
                action_space_size=A, latent_state_dim=8, support_scale=5)
    cfg.task_num = 2
    policy = MuZeroMTPolicy(cfg)
    base = _mz_batch()
    batch = MTTrainBatch(
        *base[:7],
        chance=None,
        task_id=jnp.asarray([0, 0, 1, 1], jnp.int32),
        task_weights=jnp.asarray([0.75, 0.25], jnp.float32),
    )
    _run_two_learn_iters(policy, batch)


def test_alphazero_train_step():
    from lightzero_tpu.envs.board.tictactoe import TicTacToeEnv
    from lightzero_tpu.policy.alphazero import AlphaZeroPolicy, AZTrainBatch

    cfg = AlphaZeroPolicy.default_config()
    cfg.model.observation_shape = (3, 3, 3)
    cfg.model.action_space_size = 9
    cfg.model.num_channels = 8
    cfg.model.num_res_blocks = 1
    cfg.batch_size = 4
    policy = AlphaZeroPolicy(cfg, TicTacToeEnv())
    state = policy.init_train_state(jax.random.PRNGKey(0))
    batch = AZTrainBatch(
        obs=jnp.ones((4, 3, 3, 3), jnp.float32),
        target_policy=jnp.full((4, 9), 1.0 / 9, jnp.float32),
        target_value=jnp.asarray([1.0, -1.0, 0.0, 1.0], jnp.float32),
    )
    step = jax.jit(policy._forward_learn)
    for _ in range(2):
        state, logs = step(state, batch)
    assert np.isfinite(float(logs["total_loss"]))


def test_micro_fused_search_collect():
    """One micro fused-search collect step (sims=3, B=2): the fast tier
    touches selection/expand/backup + action sampling end-to-end."""
    from lightzero_tpu.policy import MuZeroPolicy

    cfg = _tiny(MuZeroPolicy.default_config(), observation_shape=4,
                action_space_size=2, latent_state_dim=8, support_scale=5)
    policy = MuZeroPolicy(cfg)
    params = policy.model.init_params(jax.random.PRNGKey(0), batch_size=2)
    out = jax.jit(policy._forward_collect)(
        params, jax.random.PRNGKey(1),
        jnp.ones((2, 4), jnp.float32), jnp.ones((2, 2), bool),
        jnp.full((2,), -1, jnp.int32),
        jnp.asarray(1.0, jnp.float32), jnp.asarray(0.0, jnp.float32),
    )
    vc = np.asarray(out["visit_counts"])
    assert vc.shape == (2, 2) and vc.sum(-1).min() >= cfg.num_simulations
