"""End-to-end smoke tests of the training pipeline on tiny budgets
(mirrors the reference's config-as-integration-smoke-test pattern,
SURVEY.md §4.6)."""
import os

import numpy as np
import pytest

import jax

pytestmark = [pytest.mark.unittest, pytest.mark.slow]  # compile-heavy: not in the fast tier


def _tiny_cfg(tmp_path):
    from lightzero_tpu.config import Config

    return Config(
        dict(
            exp_name=str(tmp_path / "exp_smoke"),
            env=dict(
                env_id="CartPole-v0",
                stop_value=10_000,  # never stop early
                collector_env_num=4,
                evaluator_env_num=2,
                n_evaluator_episode=2,
            ),
            policy=dict(
                model=dict(
                    observation_shape=4,
                    action_space_size=2,
                    model_type="mlp",
                    latent_state_dim=32,
                    support_scale=10,
                    self_supervised_learning_loss=True,
                ),
                num_simulations=5,
                batch_size=16,
                update_per_collect=2,
                n_episode=2,
                eval_freq=1000,  # only the initial eval
                ssl_loss_weight=2,
                learning_rate=0.003,
            ),
        )
    )


def test_train_muzero_smoke(tmp_path):
    from lightzero_tpu.entry import train_muzero

    policy, state, stats = train_muzero(
        _tiny_cfg(tmp_path), seed=0, max_env_step=1500, max_train_iter=50
    )
    assert stats["env_steps"] >= 1500 or stats["train_iter"] >= 50
    assert int(state.train_iter) > 0
    # exp dir artifacts
    exp = str(tmp_path / "exp_smoke")
    assert os.path.exists(os.path.join(exp, "total_config.json"))
    assert os.path.exists(os.path.join(exp, "log", "train.jsonl"))
    ckpts = os.listdir(os.path.join(exp, "ckpt"))
    assert any("ckpt_final" in c for c in ckpts)


def test_checkpoint_roundtrip(tmp_path):
    from lightzero_tpu.config import Config
    from lightzero_tpu.policy import MuZeroPolicy
    from lightzero_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    cfg = MuZeroPolicy.default_config()
    cfg.model.latent_state_dim = 16
    cfg.model.support_scale = 5
    policy = MuZeroPolicy(cfg)
    state = policy.init_train_state(jax.random.PRNGKey(0))
    path = save_checkpoint(state, str(tmp_path / "ckpt" / "test"))
    restored = load_checkpoint(path, target=state)
    orig = jax.tree_util.tree_leaves(state.params)
    back = jax.tree_util.tree_leaves(restored.params)
    for a, b in zip(orig, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_muzero_segment_mode(tmp_path):
    """Segment pipeline: num_segments set -> min_steps collect with
    truncated flush + post-training 1D loss landscape wiring."""
    from lightzero_tpu.entry import train_muzero_segment

    cfg = _tiny_cfg(tmp_path)
    cfg.exp_name = str(tmp_path / "exp_seg")
    cfg.policy.num_segments = 2
    cfg.policy.game_segment_length = 20
    cfg.policy.analysis_loss_landscape = True
    cfg.policy.loss_landscape_mode = "1d"
    policy, state, stats = train_muzero_segment(
        cfg, seed=0, max_env_step=200, max_train_iter=10
    )
    assert int(state.train_iter) > 0
    surf = os.path.join(str(tmp_path / "exp_seg"), "loss_landscape", "loss_surface_1d.npz")
    assert os.path.exists(surf)
    dat = np.load(surf)
    assert np.all(np.isfinite(dat["loss"]))


def test_nan_guard_raises(tmp_path):
    """The numerical guard halts training on a non-finite loss."""
    from lightzero_tpu.entry import train_muzero

    cfg = _tiny_cfg(tmp_path)
    cfg.exp_name = str(tmp_path / "exp_nan")
    cfg.policy.learning_rate = 1e9  # force divergence fast
    try:
        train_muzero(cfg, seed=0, max_env_step=3000, max_train_iter=60)
    except RuntimeError as e:
        assert "non-finite" in str(e)
        assert os.path.exists(os.path.join(str(tmp_path / "exp_nan"), "ckpt", "ckpt_nan"))
