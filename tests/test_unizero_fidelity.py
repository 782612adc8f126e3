"""UniZero fidelity pack: tokenizer decoder + reconstruction loss, adaptive
entropy alpha, Encoder-Clip, gradient accumulation, KV-cache prefill, and
context-threaded reanalyze (reference unizero.py:1032-1137,
tokenizer.py:283-301, game_buffer_unizero.py:400,544)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightzero_tpu.config import Config
from lightzero_tpu.models.unizero import UniZeroModel
from lightzero_tpu.policy.unizero import UniZeroPolicy

pytestmark = [pytest.mark.unittest, pytest.mark.slow]  # compile-heavy: not in the fast tier


def _policy(**over):
    cfg = UniZeroPolicy.default_config()
    cfg.model.observation_shape = 4
    cfg.model.action_space_size = 2
    cfg.model.embed_dim = 32
    cfg.model.num_heads = 4
    cfg.model.num_layers = 1
    cfg.model.max_tokens = 16
    cfg.model.support_scale = 25
    cfg.num_unroll_steps = 3
    cfg.num_simulations = 4
    cfg.batch_size = 4
    for k, v in over.items():
        setattr(cfg, k, v)
    return UniZeroPolicy(cfg)


def _batch(policy, B=4, seed=0):
    from lightzero_tpu.policy.muzero import TrainBatch

    K = policy.num_unroll_steps
    rng = np.random.RandomState(seed)
    return TrainBatch(
        obs=jnp.asarray(rng.randn(B, K + 1, 4), jnp.float32),
        actions=jnp.asarray(rng.randint(0, 2, (B, K)), jnp.int32),
        mask=jnp.ones((B, K), jnp.float32),
        target_reward=jnp.asarray(rng.randn(B, K), jnp.float32),
        target_value=jnp.asarray(rng.randn(B, K + 1), jnp.float32),
        target_policy=jnp.full((B, K + 1, 2), 0.5, jnp.float32),
        weights=jnp.ones((B,), jnp.float32),
    )


def test_decoder_recon_loss_runs_and_decreases():
    policy = _policy(latent_recon_loss_weight=0.5)
    state = policy.init_train_state(jax.random.PRNGKey(0))
    batch = _batch(policy)
    logs0 = None
    for _ in range(12):
        state, logs, _ = policy.forward_learn(state, batch)
        if logs0 is None:
            logs0 = logs
    assert np.isfinite(float(logs["latent_recon_loss"]))
    assert float(logs["latent_recon_loss"]) < float(logs0["latent_recon_loss"])


def test_decoder_shapes_vector():
    m = UniZeroModel(observation_shape=4, action_space_size=2, embed_dim=32,
                     num_heads=4, num_layers=1, max_tokens=16, with_decoder=True)
    params = m.init_params(jax.random.PRNGKey(0), batch_size=2, K=2)
    emb = jnp.ones((3, 32))
    rec = m.apply(params, emb, method=UniZeroModel.decode_obs)
    assert rec.shape == (3, 4)


def test_adaptive_alpha_updates_and_clamps():
    policy = _policy(use_adaptive_entropy_weight=True)
    state = policy.init_train_state(jax.random.PRNGKey(0))
    la0 = float(state.params["params"]["log_alpha"])
    batch = _batch(policy)
    for _ in range(5):
        state, logs, _ = policy.forward_learn(state, batch)
    la = float(state.params["params"]["log_alpha"])
    assert la != la0
    assert np.log(5e-2) - 1e-6 <= la <= np.log(10.0) + 1e-6
    assert float(logs["entropy_weight"]) > 0


def test_encoder_clip_rescales_weights():
    policy = _policy(use_encoder_clip_annealing=True,
                     encoder_clip_start=1e-3, encoder_clip_end=1e-3)
    state = policy.init_train_state(jax.random.PRNGKey(0))
    batch = _batch(policy)
    w0 = np.asarray(
        jax.tree_util.tree_leaves(state.params["params"]["_enc"])[0]
    ).copy()
    state, logs, _ = policy.forward_learn(state, batch)
    assert float(logs["encoder_clip_scale"]) < 1.0
    # second step: latent norms must have shrunk toward the clip threshold
    state, logs2, _ = policy.forward_learn(state, batch)
    assert float(logs2["latent_norm_max"]) < float(logs["latent_norm_max"])


def test_grad_accumulation_matches_full_batch():
    p1 = _policy(accumulation_steps=1, use_adaptive_entropy_weight=False)
    p2 = _policy(accumulation_steps=2, use_adaptive_entropy_weight=False)
    s1 = p1.init_train_state(jax.random.PRNGKey(0))
    s2 = p2.init_train_state(jax.random.PRNGKey(0))
    batch = _batch(p1)
    s1, logs1, vp1 = p1.forward_learn(s1, batch)
    s2, logs2, vp2 = p2.forward_learn(s2, batch)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(vp1), np.asarray(vp2), rtol=1e-4, atol=1e-5)


def test_nonfinite_guard_skips_update():
    policy = _policy(use_adaptive_entropy_weight=False)
    state = policy.init_train_state(jax.random.PRNGKey(0))
    batch = _batch(policy)
    bad = batch._replace(obs=batch.obs.at[0, 0, 0].set(jnp.nan))
    # snapshot BEFORE the call: forward_learn donates the state buffers
    a = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()
    state2, logs, _ = policy.forward_learn(state, bad)
    assert float(logs["nonfinite_loss"]) == 1.0
    # params unchanged (zeroed grads -> adam update of zero grads is ~0)
    b = np.asarray(jax.tree_util.tree_leaves(state2.params)[0])
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_prefill_matches_sequential_inference():
    """prefill(history) must equal step-by-step infer_obs/infer_action on the
    same history (same heads at the final obs token)."""
    m = UniZeroModel(observation_shape=4, action_space_size=2, embed_dim=32,
                     num_heads=4, num_layers=1, max_tokens=16)
    params = m.init_params(jax.random.PRNGKey(0), batch_size=2, K=2)
    rng = np.random.RandomState(3)
    B, H = 2, 3
    obs_seq = jnp.asarray(rng.randn(B, H + 1, 4), jnp.float32)
    actions = jnp.asarray(rng.randint(0, 2, (B, H)), jnp.int32)

    # sequential: o_0 a_0 o_1 a_1 ... o_H
    cache = m.apply(params, B, method=UniZeroModel.init_cache)
    for t in range(H + 1):
        obs_e = m.apply(params, obs_seq[:, t], method=UniZeroModel.encode_obs)
        o_out, cache = m.apply(params, cache, obs_e, method=UniZeroModel.infer_obs_step)
        if t < H:
            _, cache = m.apply(params, cache, actions[:, t], method=UniZeroModel.infer_action_step)

    p_out, p_cache = m.apply(params, obs_seq, actions,
                             jnp.full((B,), H, jnp.int32), method=UniZeroModel.prefill)
    np.testing.assert_allclose(np.asarray(o_out["value_logits"]),
                               np.asarray(p_out["value_logits"]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_out["policy_logits"]),
                               np.asarray(p_out["policy_logits"]), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(p_cache.next_pos), 2 * H + 1)


def test_prefill_variable_lengths():
    """Rows with shorter histories must match a prefill of exactly that
    shorter history (end-aligned masking)."""
    m = UniZeroModel(observation_shape=4, action_space_size=2, embed_dim=32,
                     num_heads=4, num_layers=1, max_tokens=16)
    params = m.init_params(jax.random.PRNGKey(0), batch_size=2, K=2)
    rng = np.random.RandomState(5)
    H = 3
    obs_seq = jnp.asarray(rng.randn(1, H + 1, 4), jnp.float32)
    actions = jnp.asarray(rng.randint(0, 2, (1, H)), jnp.int32)
    # full call with length=1: only (o_{H-1}, a_{H-1}, o_H) is valid
    out_l1, _ = m.apply(params, obs_seq, actions, jnp.asarray([1]),
                        method=UniZeroModel.prefill)
    # equivalent explicit short history
    short_obs = obs_seq[:, H - 1:]
    short_act = actions[:, H - 1:]
    out_s, _ = m.apply(params, short_obs, short_act, jnp.asarray([1]),
                       method=UniZeroModel.prefill)
    np.testing.assert_allclose(np.asarray(out_l1["value_logits"]),
                               np.asarray(out_s["value_logits"]), rtol=1e-4, atol=1e-5)


def test_context_threaded_reanalyze_smoke():
    policy = _policy(reanalyze_ratio=0.5, reanalyze_context_steps=2)
    state = policy.init_train_state(jax.random.PRNGKey(0))
    from lightzero_tpu.buffers.game_buffer import GameBuffer
    from tests_helpers_buffers import fake_episode

    buf = GameBuffer(policy.cfg, policy)
    buf.push_episodes([fake_episode(T=8, A=2, obs_dim=4, seed=s) for s in range(2)],
                      [np.ones(8, np.float32)] * 2)
    batch, idx = buf.sample(4, state.target_params)
    assert np.isfinite(np.asarray(batch.target_policy)).all()


def test_head_clip_rescales_head_weights():
    """Head-Clip (reference head_clip_manager.py): with a tiny threshold the
    prediction heads are rescaled and logit maxima shrink."""
    policy = _policy(use_head_clip=True, head_clip_start=1e-6, head_clip_end=1e-6)
    state = policy.init_train_state(jax.random.PRNGKey(0))
    batch = _batch(policy)
    # asymmetric policy target: uniform target at zero-init logits has a
    # zero CE gradient, so the policy head would never move
    tp = np.zeros(batch.target_policy.shape, np.float32)
    tp[..., 0] = 0.9
    tp[..., 1] = 0.1
    batch = batch._replace(target_policy=jnp.asarray(tp))
    # step 1: heads are ~zero-init, logits grow through the update
    state, logs, _ = policy.forward_learn(state, batch)
    # step 2: now max|logits| exceeds the tiny threshold -> heads rescaled
    state, logs2, _ = policy.forward_learn(state, batch)
    assert float(logs2["head_clip_scale/_policy_head"]) < 1.0
    # step 3: the clip applied at step 2 shrank the logits
    _, logs3, _ = policy.forward_learn(state, batch)
    assert float(logs3["policy_logits_max"]) < float(logs2["policy_logits_max"])


def test_selective_weight_decay_spares_biases():
    """nanoGPT-style decay mask: with huge weight_decay, AdamW shrinks
    kernels but biases/scales (ndim<2) are not decayed."""
    import optax

    p_on = _policy(weight_decay=10.0, selective_weight_decay=True)
    p_off = _policy(weight_decay=10.0, selective_weight_decay=False)
    for p in (p_on, p_off):
        assert p.cfg.optim_type == "AdamW"
    s_on = p_on.init_train_state(jax.random.PRNGKey(0))
    s_off = p_off.init_train_state(jax.random.PRNGKey(0))
    batch = _batch(p_on)
    s_on2, _, _ = p_on.forward_learn(s_on, batch)
    s_off2, _, _ = p_off.forward_learn(s_off, batch)

    def leaf_named(params, pred):
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        return [(jax.tree_util.keystr(k), v) for k, v in flat if pred(v)]

    # biases: decayed version must differ between masked/unmasked runs
    b_on = dict(leaf_named(s_on2.params, lambda v: v.ndim == 1))
    b_off = dict(leaf_named(s_off2.params, lambda v: v.ndim == 1))
    diffs = [float(np.max(np.abs(np.asarray(b_on[k]) - np.asarray(b_off[k]))))
             for k in b_on if k in b_off]
    assert max(diffs) > 0.0  # wd=10 visibly decays biases only when unmasked
