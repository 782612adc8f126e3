"""Atari preprocessing tests (the parts that don't need ALE)."""
import numpy as np
import pytest

from lightzero_tpu.envs.atari import _resize_bilinear, is_available

pytestmark = pytest.mark.unittest


def test_resize_bilinear_shapes_and_values():
    img = np.zeros((210, 160, 3), np.uint8)
    img[:105] = 200  # top half bright
    out = _resize_bilinear(img, 96, 96)
    assert out.shape == (96, 96, 3)
    assert out[:40].mean() > 150 and out[60:].mean() < 50
    # identity-ish on same size
    small = np.random.RandomState(0).rand(8, 8, 1).astype(np.float32) * 255
    same = _resize_bilinear(small, 8, 8)
    np.testing.assert_allclose(same, small, atol=1e-3)


def test_ale_gating():
    # the build image has no ale_py; the env must gate cleanly
    assert is_available() in (True, False)
    if not is_available():
        with pytest.raises(Exception):
            from lightzero_tpu.envs.atari import AtariEnv

            AtariEnv("ALE/Pong-v5")
