"""Multitask policy types (ScaleZero parity; reference
lzero/policy/{muzero_multitask,unizero_multitask,sampled_unizero_multitask}.py).

Covers: per-task loss aggregation with task weights inside ONE jitted
step, equivalence of the one-hot segment aggregation with an explicit
per-task computation, CAGrad gradient combination, task-conditioned
world-model inference (task_view), and registry presence.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [pytest.mark.unittest, pytest.mark.slow]  # compile-heavy: not in the fast tier

from lightzero_tpu.policy.multitask import (
    MTTrainBatch,
    MuZeroMTPolicy,
    SampledUniZeroMTPolicy,
    UniZeroMTPolicy,
    attach_task_fields,
    cagrad_combine,
    task_loss_vector,
)
from lightzero_tpu.policy.muzero import TrainBatch
from lightzero_tpu.utils import POLICY_REGISTRY


def _mz_cfg(task_num=3):
    cfg = MuZeroMTPolicy.default_config()
    cfg.model.observation_shape = 4
    cfg.model.action_space_size = 3
    cfg.model.latent_state_dim = 16
    cfg.model.support_scale = 10
    cfg.num_simulations = 5
    cfg.task_num = task_num
    return cfg


def _batch(B=6, K=5, A=3, obs_dim=4, seed=0):
    r = np.random.RandomState(seed)
    return TrainBatch(
        obs=jnp.asarray(r.randn(B, K + 1, obs_dim), jnp.float32),
        actions=jnp.asarray(r.randint(0, A, (B, K)), jnp.int32),
        mask=jnp.ones((B, K), jnp.float32),
        target_reward=jnp.asarray(r.randn(B, K), jnp.float32),
        target_value=jnp.asarray(r.randn(B, K + 1), jnp.float32),
        target_policy=jnp.full((B, K + 1, A), 1.0 / A, jnp.float32),
        weights=jnp.asarray(r.uniform(0.5, 1.5, B), jnp.float32),
    )


def test_registry_has_multitask_types():
    for name in ("muzero_multitask", "unizero_multitask", "sampled_unizero_multitask"):
        assert POLICY_REGISTRY.get(name) is not None


def test_task_loss_vector_matches_explicit_per_task_means():
    r = np.random.RandomState(1)
    loss = jnp.asarray(r.randn(8), jnp.float32)
    w = jnp.asarray(r.uniform(0.5, 2.0, 8), jnp.float32)
    tid = jnp.asarray([0, 0, 1, 1, 1, 2, 2, 0], jnp.int32)
    task_loss, n = task_loss_vector(loss, w, tid, 4)
    wl = np.asarray(w) * np.asarray(loss)
    for t, expect_n in ((0, 3), (1, 3), (2, 2)):
        rows = np.asarray(tid) == t
        np.testing.assert_allclose(
            float(task_loss[t]), wl[rows].mean(), rtol=1e-6
        )
        assert int(n[t]) == expect_n
    assert float(task_loss[3]) == 0.0 and int(n[3]) == 0


def test_mt_total_is_weighted_mean_of_present_tasks():
    """MT _loss_fn == Σ τ_t·L_t / #present (+extra), L_t the per-task mean."""
    cfg = _mz_cfg(task_num=3)
    policy = MuZeroMTPolicy(cfg)
    state = policy.init_train_state(jax.random.PRNGKey(0))
    base = _batch()
    tid = jnp.asarray([0, 0, 1, 1, 2, 2], jnp.int32)
    tw = jnp.asarray([2.0, 0.5, 1.0], jnp.float32)
    mt = attach_task_fields(base, tid, tw)
    assert isinstance(mt, MTTrainBatch)

    scaled, (logs, vp) = policy._loss_fn(state.params, mt)
    # explicit reconstruction from the base per-sample losses
    loss_vec, extra, _, _ = policy._sample_losses(state.params, base)
    wl = np.asarray(base.weights) * np.asarray(loss_vec)
    expect = np.mean(
        [2.0 * wl[0:2].mean(), 0.5 * wl[2:4].mean(), 1.0 * wl[4:6].mean()]
    ) + float(extra)
    np.testing.assert_allclose(float(logs["total_loss"]), expect, rtol=1e-5)
    assert vp.shape == (6,)
    for t in range(3):
        assert f"task{t}_loss" in logs


def test_mt_forward_learn_one_jitted_step_updates_params():
    cfg = _mz_cfg(task_num=2)
    policy = MuZeroMTPolicy(cfg)
    state = policy.init_train_state(jax.random.PRNGKey(0))
    mt = attach_task_fields(
        _batch(), jnp.asarray([0, 0, 0, 1, 1, 1]), jnp.asarray([1.0, 1.0])
    )
    # forward_learn donates the state buffers — snapshot before
    before = [np.asarray(l) for l in jax.tree_util.tree_leaves(state.params)]
    new_state, logs, vp = policy.forward_learn(state, mt)
    assert int(new_state.train_iter) == 1
    assert np.isfinite(float(logs["total_loss"]))
    # params actually moved
    moved = any(
        not np.allclose(a, np.asarray(b))
        for a, b in zip(before, jax.tree_util.tree_leaves(new_state.params))
    )
    assert moved


def test_cagrad_agreeing_tasks_returns_scaled_average():
    # two identical task gradients: w irrelevant, combined = (1+c)·g
    g = {"a": jnp.asarray([[1.0, 2.0], [1.0, 2.0]])}
    combined, w = cagrad_combine(g, c=0.4)
    np.testing.assert_allclose(np.asarray(combined["a"]), [1.4, 2.8], rtol=1e-5)


def test_cagrad_conflicting_tasks_damps_conflict():
    # opposing gradients: plain average is tiny and kills both tasks;
    # CAGrad's combined update must not blow up and must stay finite
    g = {"a": jnp.asarray([[1.0, 0.1], [-1.0, 0.1]])}
    combined, w = cagrad_combine(g, c=0.4)
    arr = np.asarray(combined["a"])
    assert np.all(np.isfinite(arr))
    # the shared descent direction (second coord) survives
    assert arr[1] > 0.05
    # simplex weights
    np.testing.assert_allclose(float(w.sum()), 1.0, rtol=1e-5)


def test_mt_cagrad_forward_learn_runs():
    cfg = _mz_cfg(task_num=2)
    cfg.grad_correction = "cagrad"
    policy = MuZeroMTPolicy(cfg)
    state = policy.init_train_state(jax.random.PRNGKey(0))
    mt = attach_task_fields(
        _batch(), jnp.asarray([0, 0, 0, 1, 1, 1]), jnp.asarray([1.0, 1.0])
    )
    new_state, logs, vp = policy.forward_learn(state, mt)
    assert np.isfinite(float(logs["grad_norm"]))
    assert "task0_cagrad_w" in logs
    np.testing.assert_allclose(
        float(logs["task0_cagrad_w"]) + float(logs["task1_cagrad_w"]), 1.0, rtol=1e-4
    )


def test_muzero_mt_task_embedding_changes_outputs():
    """muzero_model_multitask role: the task embedding conditions the root
    latent, so the same obs under different task ids predicts differently."""
    cfg = _mz_cfg(task_num=3)
    policy = MuZeroMTPolicy(cfg)
    assert policy.model.num_tasks == 3
    state = policy.init_train_state(jax.random.PRNGKey(0))
    obs = jnp.ones((4, 4))
    o0 = policy._initial(state.params, obs, jnp.zeros((4,), jnp.int32))
    o2 = policy._initial(state.params, obs, jnp.full((4,), 2, jnp.int32))
    # heads are zero-init (last_linear_layer_init_zero), so compare the
    # conditioned latents, not the (initially all-zero) logits
    assert not np.allclose(np.asarray(o0.latent_state), np.asarray(o2.latent_state))


def _uz_cfg(cls, task_num=3):
    cfg = cls.default_config()
    cfg.model.observation_shape = 4
    cfg.model.action_space_size = 3
    cfg.model.embed_dim = 32
    cfg.model.num_layers = 1
    cfg.model.num_heads = 2
    cfg.model.max_tokens = 16
    cfg.model.support_scale = 5
    cfg.num_unroll_steps = 4
    cfg.num_simulations = 4
    cfg.task_num = task_num
    cfg.use_adaptive_entropy_weight = False
    return cfg


def test_unizero_mt_task_embedding_changes_loss():
    """Same data under different task ids must produce different losses
    (the task embedding conditions every token)."""
    cfg = _uz_cfg(UniZeroMTPolicy)
    policy = UniZeroMTPolicy(cfg)
    assert policy.model.num_tasks >= 3
    state = policy.init_train_state(jax.random.PRNGKey(0))
    base = _batch(K=4)
    tw = jnp.ones((3,))
    l0, _ = policy._loss_fn(
        state.params, attach_task_fields(base, jnp.zeros(6, jnp.int32), tw)
    )
    l2, _ = policy._loss_fn(
        state.params, attach_task_fields(base, jnp.full((6,), 2, jnp.int32), tw)
    )
    assert abs(float(l0) - float(l2)) > 1e-7


def test_unizero_mt_forward_learn_and_task_view():
    cfg = _uz_cfg(UniZeroMTPolicy, task_num=2)
    policy = UniZeroMTPolicy(cfg)
    state = policy.init_train_state(jax.random.PRNGKey(0))
    mt = attach_task_fields(
        _batch(K=4), jnp.asarray([0, 0, 0, 1, 1, 1]), jnp.asarray([1.5, 0.5])
    )
    new_state, logs, _ = policy.forward_learn(state, mt)  # donates `state`
    assert np.isfinite(float(logs["total_loss"]))

    # task-conditioned collect through a view: different tasks, different
    # searched values under the same params/obs
    view0, view1 = policy.task_view(0), policy.task_view(1)
    assert view0._collect_task_id == 0 and view1._collect_task_id == 1
    B = 2
    obs = jnp.ones((B, 4))
    legal = jnp.ones((B, 3), bool)
    to_play = jnp.full((B,), -1, jnp.int32)
    outs = []
    for v in (view0, view1):
        cs = v.init_collect_state(B)
        out, _ = jax.jit(v._forward_collect_stateful, static_argnames=("deterministic",))(
            new_state.params, jax.random.PRNGKey(3), obs, legal, to_play,
            jnp.asarray(1.0), jnp.asarray(0.0), cs, deterministic=True,
        )
        outs.append(np.asarray(out["searched_value"]))
    assert not np.allclose(outs[0], outs[1])


def test_sampled_unizero_mt_learn_step():
    from lightzero_tpu.policy.sampled_muzero import SampledTrainBatch

    cfg = _uz_cfg(SampledUniZeroMTPolicy, task_num=2)
    cfg.num_of_sampled_actions = 4
    cfg.model.action_space_size = 2  # continuous action dim
    policy = SampledUniZeroMTPolicy(cfg)
    state = policy.init_train_state(jax.random.PRNGKey(0))
    B, K, Ks, D = 4, 4, 4, 2
    r = np.random.RandomState(0)
    base = TrainBatch(
        obs=jnp.asarray(r.randn(B, K + 1, 4), jnp.float32),
        actions=jnp.asarray(r.uniform(-1, 1, (B, K, D)), jnp.float32),
        mask=jnp.ones((B, K), jnp.float32),
        target_reward=jnp.zeros((B, K), jnp.float32),
        target_value=jnp.ones((B, K + 1), jnp.float32),
        target_policy=jnp.full((B, K + 1, Ks), 1.0 / Ks, jnp.float32),
        weights=jnp.ones((B,), jnp.float32),
    )
    sampled = SampledTrainBatch(
        base=base,
        sampled_actions=jnp.asarray(r.uniform(-0.9, 0.9, (B, K + 1, Ks, D)), jnp.float32),
    )
    mt = attach_task_fields(sampled, jnp.asarray([0, 0, 1, 1]), jnp.asarray([1.0, 1.0]))
    assert isinstance(mt.base, MTTrainBatch)
    new_state, logs, vp = policy.forward_learn(state, mt)
    assert np.isfinite(float(logs["total_loss"]))
    assert "task1_loss" in logs
