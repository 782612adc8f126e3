"""ViT image encoder (flax) — alternative UniZero tokenizer encoder.

Capability-parity rebuild of reference lzero/model/unizero_world_models/
vit.py (patch embedding + pre-norm transformer encoder + mean-pool head
feeding the world-model embedding). Sized for the small RL frames UniZero
consumes (64-96px); attention is plain MXU matmul.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp


class ViTBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm()(x)
        h = nn.MultiHeadDotProductAttention(num_heads=self.heads)(h, h)
        x = x + h
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.mlp_ratio * self.dim)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim)(h)
        return x + h


class ViT(nn.Module):
    """(B, H, W, C) image → (B, out_dim) embedding."""

    out_dim: int = 256
    patch_size: int = 8
    dim: int = 128
    depth: int = 4
    heads: int = 4

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = obs.shape
        P = self.patch_size
        # patch embedding as a strided conv (equivalent to linear over
        # flattened patches)
        x = nn.Conv(self.dim, (P, P), strides=(P, P), padding="VALID")(obs)
        x = x.reshape(B, -1, self.dim)  # (B, N_patches, dim)
        n = x.shape[1]
        pos = self.param("pos_embed", nn.initializers.normal(0.02), (1, n, self.dim))
        x = x + pos
        for _ in range(self.depth):
            x = ViTBlock(self.dim, self.heads)(x)
        x = nn.LayerNorm()(x)
        x = jnp.mean(x, axis=1)  # mean-pool patches
        return nn.Dense(self.out_dim)(x)
