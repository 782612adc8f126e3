"""Image augmentations for the SSL consistency loss, as jitted ops.

Capability-parity rebuild of reference lzero/model/image_transform.py:
``RandomCrop`` (pad-4 + random shift) and ``Intensity`` (per-image scalar
noise), composed as ``ImageTransforms`` and applied to learn-batch images
(lzero/policy/muzero.py:310-314). NHWC layout; one jitted call augments a
whole batch."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def random_shift(rng: jax.Array, imgs: jnp.ndarray, pad: int = 4) -> jnp.ndarray:
    """(B, H, W, C): replicate-pad by ``pad`` then random crop back."""
    B, H, W, C = imgs.shape
    padded = jnp.pad(imgs, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    rngs = jax.random.split(rng, B)

    def crop_one(img, r):
        dy, dx = jax.random.randint(r, (2,), 0, 2 * pad + 1)
        return jax.lax.dynamic_slice(img, (dy, dx, 0), (H, W, C))

    return jax.vmap(crop_one)(padded, rngs)


def intensity(rng: jax.Array, imgs: jnp.ndarray, scale: float = 0.05) -> jnp.ndarray:
    """Per-image multiplicative intensity jitter (Intensity,
    image_transform.py)."""
    B = imgs.shape[0]
    noise = 1.0 + scale * jnp.clip(jax.random.normal(rng, (B, 1, 1, 1)), -2.0, 2.0)
    return imgs * noise


def augment_batch(rng: jax.Array, imgs: jnp.ndarray, pad: int = 4, scale: float = 0.05) -> jnp.ndarray:
    """shift + intensity (the reference's default ``augmentation=
    ['shift', 'intensity']``)."""
    r1, r2 = jax.random.split(rng)
    return intensity(r2, random_shift(r1, imgs, pad), scale)
