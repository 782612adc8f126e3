"""LPIPS perceptual distance (ops/lpips.py): metric sanity + gated wiring
into the UniZero reconstruction loss (reference lpips.py / tokenizer.py:283)."""
import jax
import jax.numpy as jnp
import numpy as np

from lightzero_tpu.ops.lpips import lpips_distance


def test_lpips_metric_properties():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(2, 16, 16, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(size=(2, 16, 16, 3)).astype(np.float32))
    d_xx = jax.jit(lpips_distance)(x, x)
    d_xy = jax.jit(lpips_distance)(x, y)
    assert d_xx.shape == (2,)
    assert np.allclose(np.asarray(d_xx), 0.0, atol=1e-6)
    assert np.all(np.asarray(d_xy) > 1e-4)
    # symmetry
    d_yx = jax.jit(lpips_distance)(y, x)
    assert np.allclose(np.asarray(d_xy), np.asarray(d_yx), rtol=1e-4)
    # near-identical images are closer than unrelated ones
    d_near = jax.jit(lpips_distance)(x, jnp.clip(x + 0.01, 0, 1))
    assert np.all(np.asarray(d_near) < np.asarray(d_xy))


def test_lpips_grayscale_broadcast():
    x = jnp.ones((1, 8, 8, 4)) * 0.5  # framestack -> averaged to 3ch
    d = lpips_distance(x, x)
    assert np.allclose(np.asarray(d), 0.0, atol=1e-6)
