"""Shared neural building blocks (flax linen).

Capability-parity rebuild of reference lzero/model/common.py (MLP_V2 :28,
RepresentationNetworkMLP :789, PredictionNetworkMLP :1214, SimNorm :145,
RepresentationNetwork conv ResNet :705, DownSample :265,
PredictionNetwork :1077) — re-designed for TPU:

- LayerNorm instead of BatchNorm (``norm_type='BN'`` is accepted and mapped
  to LN): purely functional, no mutable batch statistics to thread through
  the jit-fused search, and elementwise ops fuse into the surrounding
  matmuls on the VPU.
- NHWC conv layout (XLA TPU native).
- bfloat16-friendly: params stay f32; activations cast via ``dtype``.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class NetworkOutput(NamedTuple):
    """Unified inference output (reference MZNetworkOutput/EZNetworkOutput,
    lzero/model/common.py:105-143). ``reward`` holds value_prefix for
    EfficientZero. All scalar fields are raw head logits; the policy layer
    applies the inverse scalar transform."""

    value_logits: jnp.ndarray  # (B, value_support) or (B, 1)
    reward_logits: jnp.ndarray  # (B, reward_support) or (B, 1)
    policy_logits: jnp.ndarray  # (B, A) or continuous params
    latent_state: Any  # pytree


def _norm(norm_type: Optional[str]):
    if norm_type in ("LN", "BN", "layer_norm", "batch_norm"):
        # BN intentionally mapped to LN — see module docstring.
        return nn.LayerNorm(use_bias=True, use_scale=True)
    if norm_type in (None, "none"):
        return None
    raise ValueError(f"unsupported norm_type {norm_type!r}")


class SimNorm(nn.Module):
    """Simplicial normalization (reference common.py:145): group the latent
    into chunks of ``simnorm_dim`` and softmax each chunk."""

    simnorm_dim: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shp = x.shape
        x = x.reshape(*shp[:-1], -1, self.simnorm_dim)
        x = jax.nn.softmax(x, axis=-1)
        return x.reshape(*shp)


class MLPTorso(nn.Module):
    """Configurable MLP (reference ding MLP / MLP_V2): hidden_sizes +
    output_size, norm + activation on hidden layers, optional zero-init of
    the final linear (last_linear_layer_init_zero, the reference default for
    reward/value/policy heads)."""

    hidden_sizes: Sequence[int]
    output_size: int
    activation: Callable = nn.relu
    norm_type: Optional[str] = "LN"
    last_linear_layer_init_zero: bool = False
    output_activation: bool = False  # apply norm+act after the final layer
    output_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for h in self.hidden_sizes:
            x = nn.Dense(h)(x)
            norm = _norm(self.norm_type)
            if norm is not None:
                x = norm(x)
            x = self.activation(x)
        kernel_init = (
            nn.initializers.zeros if self.last_linear_layer_init_zero else nn.initializers.lecun_normal()
        )
        x = nn.Dense(self.output_size, kernel_init=kernel_init)(x)
        if self.output_norm:
            norm = _norm(self.norm_type)
            if norm is not None:
                x = norm(x)
        if self.output_activation:
            x = self.activation(x)
        return x


class RepresentationNetworkMLP(nn.Module):
    """obs (B, obs_dim) → latent (B, latent_dim) (reference common.py:789:
    2-layer MLP with norm, output normalized + activated)."""

    latent_state_dim: int = 256
    norm_type: str = "LN"
    activation: Callable = nn.relu
    final_norm: str = "LN"  # 'LN' | 'simnorm' | 'none'

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> jnp.ndarray:
        x = MLPTorso(
            hidden_sizes=(self.latent_state_dim,),
            output_size=self.latent_state_dim,
            activation=self.activation,
            norm_type=self.norm_type,
            output_norm=self.final_norm == "LN",
            output_activation=self.final_norm == "LN",
        )(obs)
        if self.final_norm == "simnorm":
            x = SimNorm()(x)
        return x


class DynamicsNetworkMLP(nn.Module):
    """(latent, action_encoding) → (next_latent, reward_logits)
    (reference muzero_model_mlp.py DynamicsNetwork: common_layer_num=2 torso
    + reward head, optional residual connection)."""

    latent_state_dim: int = 256
    reward_support_size: int = 601
    common_layer_num: int = 2
    reward_head_hidden_channels: Sequence[int] = (32,)
    norm_type: str = "LN"
    activation: Callable = nn.relu
    res_connection_in_dynamics: bool = False
    last_linear_layer_init_zero: bool = True

    @nn.compact
    def __call__(self, latent: jnp.ndarray, action_encoding: jnp.ndarray):
        x = jnp.concatenate([latent, action_encoding], axis=-1)
        next_latent = MLPTorso(
            hidden_sizes=(self.latent_state_dim,) * (self.common_layer_num - 1),
            output_size=self.latent_state_dim,
            activation=self.activation,
            norm_type=self.norm_type,
            output_norm=True,
            output_activation=True,
        )(x)
        if self.res_connection_in_dynamics:
            next_latent = next_latent + latent
        reward_logits = MLPTorso(
            hidden_sizes=tuple(self.reward_head_hidden_channels),
            output_size=self.reward_support_size,
            activation=self.activation,
            norm_type=self.norm_type,
            last_linear_layer_init_zero=self.last_linear_layer_init_zero,
        )(next_latent)
        return next_latent, reward_logits


class PredictionNetworkMLP(nn.Module):
    """latent → (value_logits, policy_logits) (reference common.py:1214:
    common torso + separate value/policy heads, zero-init final layers)."""

    action_space_size: int
    value_support_size: int = 601
    common_layer_num: int = 2
    value_head_hidden_channels: Sequence[int] = (32,)
    policy_head_hidden_channels: Sequence[int] = (32,)
    norm_type: str = "LN"
    activation: Callable = nn.relu
    last_linear_layer_init_zero: bool = True

    @nn.compact
    def __call__(self, latent: jnp.ndarray):
        latent_dim = latent.shape[-1]
        x = MLPTorso(
            hidden_sizes=(latent_dim,) * (self.common_layer_num - 1),
            output_size=latent_dim,
            activation=self.activation,
            norm_type=self.norm_type,
            output_norm=True,
            output_activation=True,
        )(latent)
        value_logits = MLPTorso(
            hidden_sizes=tuple(self.value_head_hidden_channels),
            output_size=self.value_support_size,
            activation=self.activation,
            norm_type=self.norm_type,
            last_linear_layer_init_zero=self.last_linear_layer_init_zero,
        )(x)
        policy_logits = MLPTorso(
            hidden_sizes=tuple(self.policy_head_hidden_channels),
            output_size=self.action_space_size,
            activation=self.activation,
            norm_type=self.norm_type,
            last_linear_layer_init_zero=self.last_linear_layer_init_zero,
        )(x)
        return value_logits, policy_logits


# ----------------------------- conv stack (image obs) -----------------------


class ResBlock(nn.Module):
    """Pre-activation-free basic residual block (reference ding ResBlock as
    used by RepresentationNetwork, common.py:705). NHWC."""

    channels: int
    norm_type: str = "LN"
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False)(x)
        y = nn.LayerNorm()(y)
        y = self.activation(y)
        y = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False)(y)
        y = nn.LayerNorm()(y)
        return self.activation(x + y)


class DownSample(nn.Module):
    """96×96 → 6×6 stride-pyramid for Atari (reference common.py:265):
    conv s2 → 1 res → conv s2 → 1 res → avgpool s2 → 1 res → avgpool s2."""

    out_channels: int = 64
    norm_type: str = "LN"
    activation: Callable = nn.relu
    num_resblocks: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.out_channels
        x = nn.Conv(c // 2, (3, 3), strides=(2, 2), padding="SAME", use_bias=False)(x)
        x = nn.LayerNorm()(x)
        x = self.activation(x)
        for _ in range(self.num_resblocks):
            x = ResBlock(c // 2, self.norm_type, self.activation)(x)
        x = nn.Conv(c, (3, 3), strides=(2, 2), padding="SAME", use_bias=False)(x)
        x = nn.LayerNorm()(x)
        x = self.activation(x)
        for _ in range(self.num_resblocks):
            x = ResBlock(c, self.norm_type, self.activation)(x)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        for _ in range(self.num_resblocks):
            x = ResBlock(c, self.norm_type, self.activation)(x)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x


class RepresentationNetworkConv(nn.Module):
    """Image obs (B, H, W, C_in) → latent (B, h, w, C) conv ResNet
    (reference common.py:705)."""

    num_channels: int = 64
    num_res_blocks: int = 1
    downsample: bool = True
    norm_type: str = "LN"
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> jnp.ndarray:
        if self.downsample:
            x = DownSample(self.num_channels, self.norm_type, self.activation)(obs)
        else:
            x = nn.Conv(self.num_channels, (3, 3), padding="SAME", use_bias=False)(obs)
            x = nn.LayerNorm()(x)
            x = self.activation(x)
        for _ in range(self.num_res_blocks):
            x = ResBlock(self.num_channels, self.norm_type, self.activation)(x)
        return x


class DynamicsNetworkConv(nn.Module):
    """(latent (B,h,w,C), action plane (B,h,w,A_enc)) → next latent + reward
    logits (reference muzero_model.py DynamicsNetwork)."""

    num_channels: int = 64
    num_res_blocks: int = 1
    reward_support_size: int = 601
    reward_head_hidden_channels: Sequence[int] = (32,)
    reward_head_channels: int = 16
    norm_type: str = "LN"
    activation: Callable = nn.relu
    last_linear_layer_init_zero: bool = True

    @nn.compact
    def __call__(self, latent: jnp.ndarray, action_plane: jnp.ndarray):
        x = jnp.concatenate([latent, action_plane], axis=-1)
        x = nn.Conv(self.num_channels, (3, 3), padding="SAME", use_bias=False)(x)
        x = nn.LayerNorm()(x)
        x = self.activation(x + latent)  # residual to the state path
        for _ in range(self.num_res_blocks):
            x = ResBlock(self.num_channels, self.norm_type, self.activation)(x)
        next_latent = x
        r = nn.Conv(self.reward_head_channels, (1, 1), use_bias=False)(x)
        r = nn.LayerNorm()(r)
        r = self.activation(r)
        r = r.reshape(r.shape[0], -1)
        reward_logits = MLPTorso(
            hidden_sizes=tuple(self.reward_head_hidden_channels),
            output_size=self.reward_support_size,
            activation=self.activation,
            norm_type=self.norm_type,
            last_linear_layer_init_zero=self.last_linear_layer_init_zero,
        )(r)
        return next_latent, reward_logits


class PredictionNetworkConv(nn.Module):
    """latent (B,h,w,C) → (value_logits, policy_logits)
    (reference common.py:1077: res blocks + 1×1-conv heads + MLPs)."""

    action_space_size: int
    value_support_size: int = 601
    num_res_blocks: int = 1
    num_channels: int = 64
    value_head_channels: int = 16
    policy_head_channels: int = 16
    value_head_hidden_channels: Sequence[int] = (32,)
    policy_head_hidden_channels: Sequence[int] = (32,)
    norm_type: str = "LN"
    activation: Callable = nn.relu
    last_linear_layer_init_zero: bool = True

    @nn.compact
    def __call__(self, latent: jnp.ndarray):
        x = latent
        for _ in range(self.num_res_blocks):
            x = ResBlock(self.num_channels, self.norm_type, self.activation)(x)

        def head(channels, hidden, out_size):
            h = nn.Conv(channels, (1, 1), use_bias=False)(x)
            h = nn.LayerNorm()(h)
            h = self.activation(h)
            h = h.reshape(h.shape[0], -1)
            return MLPTorso(
                hidden_sizes=tuple(hidden),
                output_size=out_size,
                activation=self.activation,
                norm_type=self.norm_type,
                last_linear_layer_init_zero=self.last_linear_layer_init_zero,
            )(h)

        value_logits = head(self.value_head_channels, self.value_head_hidden_channels, self.value_support_size)
        policy_logits = head(self.policy_head_channels, self.policy_head_hidden_channels, self.action_space_size)
        return value_logits, policy_logits


class SSLProjector(nn.Module):
    """SimSiam-style projector + predictor for the SSL consistency loss
    (reference muzero_model.py:376-413 / muzero_model_mlp.py:130-143).

    ``__call__(latent, with_grad=True)`` returns predictor(projection(x))
    (online branch); ``with_grad=False`` returns projection(x) only (target
    branch; the caller applies stop_gradient)."""

    proj_hid: int = 1024
    proj_out: int = 1024
    pred_hid: int = 512
    pred_out: int = 1024
    activation: Callable = nn.relu

    def setup(self):
        self.proj = [nn.Dense(self.proj_hid), nn.Dense(self.proj_hid), nn.Dense(self.proj_out)]
        self.proj_norms = [nn.LayerNorm(), nn.LayerNorm(), nn.LayerNorm()]
        self.pred = [nn.Dense(self.pred_hid), nn.Dense(self.pred_out)]
        self.pred_norm = nn.LayerNorm()

    def __call__(self, latent: jnp.ndarray, with_grad: bool = True) -> jnp.ndarray:
        x = latent.reshape(latent.shape[0], -1)
        for i, (dense, norm) in enumerate(zip(self.proj, self.proj_norms)):
            x = dense(x)
            x = norm(x)
            if i < 2:
                x = self.activation(x)
        if not with_grad:
            return x
        y = self.pred[0](x)
        y = self.pred_norm(y)
        y = self.activation(y)
        return self.pred[1](y)


class LatentDecoder(nn.Module):
    """1D latent embedding → NHWC image (reference LatentDecoder,
    common.py:849-906: fc + 3 stride-2 deconv blocks for an 8× upsample) —
    the inverse of RepresentationNetworkUniZero for image-UniZero
    reconstruction losses."""

    output_shape: tuple  # (H, W, C)
    num_channels: int = 64
    activation: Callable = nn.gelu

    @nn.compact
    def __call__(self, embeddings: jnp.ndarray) -> jnp.ndarray:
        H, W, C = self.output_shape
        h0, w0 = H // 8, W // 8
        x = nn.Dense(h0 * w0 * self.num_channels)(embeddings)
        x = x.reshape(-1, h0, w0, self.num_channels)
        for ch in (self.num_channels // 2, self.num_channels // 4):
            x = nn.ConvTranspose(ch, (3, 3), strides=(2, 2))(x)
            x = self.activation(x)
            x = nn.LayerNorm()(x)
        x = nn.ConvTranspose(C, (3, 3), strides=(2, 2))(x)
        return x[:, :H, :W, :]


class LatentEncoderForMemoryEnv(nn.Module):
    """Small-image obs → latent embedding for the memory env family
    (reference common.py:911-1000: conv stack + adaptive average pool +
    final fc with SimNorm-compatible output)."""

    embedding_size: int = 100
    channels: Sequence[int] = (16, 32, 64)
    activation: Callable = nn.gelu

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> jnp.ndarray:
        x = obs
        for ch in self.channels:
            x = nn.Conv(ch, (3, 3), padding="SAME")(x)
            x = self.activation(x)
            x = nn.LayerNorm()(x)
        x = jnp.mean(x, axis=(1, 2))  # adaptive average pool → (B, C_last)
        return nn.Dense(self.embedding_size)(x)


class LatentDecoderForMemoryEnv(nn.Module):
    """Latent embedding → small-image reconstruction for the memory env
    (reference common.py:1003-1067: fc + deconv stack + sigmoid output)."""

    image_shape: tuple = (5, 5, 3)  # (H, W, C)
    channels: Sequence[int] = (64, 32, 16)
    activation: Callable = nn.gelu

    @nn.compact
    def __call__(self, embeddings: jnp.ndarray) -> jnp.ndarray:
        H, W, C = self.image_shape
        x = nn.Dense(H * W * self.channels[0])(embeddings)
        x = x.reshape(-1, H, W, self.channels[0])
        for ch in self.channels[1:]:
            x = nn.Conv(ch, (3, 3), padding="SAME")(x)
            x = self.activation(x)
            x = nn.LayerNorm()(x)
        x = nn.Conv(C, (3, 3), padding="SAME")(x)
        return jax.nn.sigmoid(x)
