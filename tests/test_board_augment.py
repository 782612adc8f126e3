"""Dihedral board augmentation (reference get_augmented_data,
lzero/mcts/utils.py:45)."""
import numpy as np
import pytest

from lightzero_tpu.ops.board_augment import get_augmented_data

pytestmark = pytest.mark.unittest


def test_square_board_8_fold_orbit():
    h = w = 3
    obs = np.arange(h * w * 2, dtype=np.float32).reshape(h, w, 2)
    probs = np.random.RandomState(0).dirichlet(np.ones(h * w)).astype(np.float32)
    out = get_augmented_data(obs, probs, z=1.0)
    assert len(out) == 8
    # identity first
    np.testing.assert_array_equal(out[0].obs, obs)
    np.testing.assert_array_equal(out[0].probs, probs)
    # all variants keep mass / z, and obs-prob transforms are consistent:
    # the prob at a cell must follow that cell's plane value
    for s in out:
        assert s.z == 1.0
        np.testing.assert_allclose(s.probs.sum(), 1.0, rtol=1e-6)
        # plane 0 holds the unique cell ids 0,2,4,... -> invert the permutation
        ids = (s.obs[:, :, 0].reshape(-1) / 2).astype(int)
        np.testing.assert_allclose(s.probs, probs[ids], rtol=1e-6)
    # orbit elements are distinct transforms of the board
    boards = {s.obs.tobytes() for s in out}
    assert len(boards) == 8


def test_pass_action_is_invariant():
    h = w = 5
    obs = np.random.RandomState(1).rand(h, w, 3).astype(np.float32)
    probs = np.random.RandomState(2).dirichlet(np.ones(h * w + 1)).astype(np.float32)
    out = get_augmented_data(obs, probs, z=-1.0)
    assert len(out) == 8
    for s in out:
        assert s.probs.shape == (h * w + 1,)
        np.testing.assert_allclose(s.probs[-1], probs[-1], rtol=1e-6)


def test_column_game_mirror_only():
    obs = np.random.RandomState(3).rand(6, 7, 3).astype(np.float32)
    probs = np.random.RandomState(4).dirichlet(np.ones(7)).astype(np.float32)
    out = get_augmented_data(obs, probs, z=0.0)
    assert len(out) == 2
    np.testing.assert_array_equal(out[1].obs, obs[:, ::-1])
    np.testing.assert_array_equal(out[1].probs, probs[::-1])


def test_asymmetric_action_space_identity_only():
    obs = np.zeros((8, 8, 2), np.float32)
    probs = np.ones(4672, np.float32) / 4672  # chess-like
    assert len(get_augmented_data(obs, probs, 0.0)) == 1
