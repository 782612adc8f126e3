"""EfficientZero model (flax): MuZero + LSTM value-prefix head.

Capability-parity rebuild of reference lzero/model/efficientzero_model.py /
efficientzero_model_mlp.py: the dynamics network additionally threads a
reward-hidden LSTM state (c, h) and predicts a **value_prefix** (discounted
reward sum since the last horizon reset) instead of a per-step reward
(lstm_hidden_size, lzero/policy/efficientzero.py:53).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lightzero_tpu.models.common import (
    DynamicsNetworkMLP,
    MLPTorso,
    PredictionNetworkMLP,
    RepresentationNetworkConv,
    RepresentationNetworkMLP,
    PredictionNetworkConv,
    ResBlock,
    SSLProjector,
)


class EZNetworkOutput(NamedTuple):
    """reference EZNetworkOutput (lzero/model/common.py:121)."""

    value_logits: jnp.ndarray
    value_prefix_logits: jnp.ndarray
    policy_logits: jnp.ndarray
    latent_state: jnp.ndarray
    reward_hidden: Tuple[jnp.ndarray, jnp.ndarray]  # (c, h)


class EfficientZeroModel(nn.Module):
    observation_shape: Any = 4
    action_space_size: int = 2
    model_type: str = "mlp"  # 'mlp' | 'conv'
    latent_state_dim: int = 256
    lstm_hidden_size: int = 512
    value_support_size: int = 601
    reward_support_size: int = 601
    common_layer_num: int = 2
    reward_head_hidden_channels: Sequence[int] = (32,)
    value_head_hidden_channels: Sequence[int] = (32,)
    policy_head_hidden_channels: Sequence[int] = (32,)
    num_channels: int = 64
    num_res_blocks: int = 1
    downsample: bool = True
    value_head_channels: int = 16
    policy_head_channels: int = 16
    norm_type: str = "LN"
    last_linear_layer_init_zero: bool = True
    discrete_action_encoding_type: str = "one_hot"
    proj_hid: int = 1024
    proj_out: int = 1024
    pred_hid: int = 512
    pred_out: int = 1024

    def setup(self):
        if self.model_type == "mlp":
            self._repr = RepresentationNetworkMLP(
                latent_state_dim=self.latent_state_dim, norm_type=self.norm_type
            )
            self._pred = PredictionNetworkMLP(
                action_space_size=self.action_space_size,
                value_support_size=self.value_support_size,
                common_layer_num=self.common_layer_num,
                value_head_hidden_channels=self.value_head_hidden_channels,
                policy_head_hidden_channels=self.policy_head_hidden_channels,
                norm_type=self.norm_type,
                last_linear_layer_init_zero=self.last_linear_layer_init_zero,
            )
            # state-transition torso (the reward head is the LSTM below)
            self._dyn_torso = MLPTorso(
                hidden_sizes=(self.latent_state_dim,) * (self.common_layer_num - 1),
                output_size=self.latent_state_dim,
                norm_type=self.norm_type,
                output_norm=True,
                output_activation=True,
            )
        elif self.model_type == "conv":
            self._repr = RepresentationNetworkConv(
                num_channels=self.num_channels,
                num_res_blocks=self.num_res_blocks,
                downsample=self.downsample,
                norm_type=self.norm_type,
            )
            self._pred = PredictionNetworkConv(
                action_space_size=self.action_space_size,
                value_support_size=self.value_support_size,
                num_res_blocks=self.num_res_blocks,
                num_channels=self.num_channels,
                value_head_channels=self.value_head_channels,
                policy_head_channels=self.policy_head_channels,
                value_head_hidden_channels=self.value_head_hidden_channels,
                policy_head_hidden_channels=self.policy_head_hidden_channels,
                norm_type=self.norm_type,
                last_linear_layer_init_zero=self.last_linear_layer_init_zero,
            )
            self._dyn_conv = nn.Conv(self.num_channels, (3, 3), padding="SAME", use_bias=False)
            self._dyn_norm = nn.LayerNorm()
            self._dyn_blocks = [
                ResBlock(self.num_channels, self.norm_type) for _ in range(self.num_res_blocks)
            ]
            self._vp_reduce = nn.Conv(16, (1, 1), use_bias=False)
            self._vp_reduce_norm = nn.LayerNorm()
        else:
            raise ValueError(self.model_type)
        self._lstm = nn.OptimizedLSTMCell(features=self.lstm_hidden_size)
        self._vp_head = MLPTorso(
            hidden_sizes=tuple(self.reward_head_hidden_channels),
            output_size=self.reward_support_size,
            norm_type=self.norm_type,
            last_linear_layer_init_zero=self.last_linear_layer_init_zero,
        )
        self._vp_norm = nn.LayerNorm()
        self._proj = SSLProjector(
            proj_hid=self.proj_hid,
            proj_out=self.proj_out,
            pred_hid=self.pred_hid,
            pred_out=self.pred_out,
        )

    # ------------------------------------------------------------------ api
    def representation(self, obs: jnp.ndarray) -> jnp.ndarray:
        return self._repr(obs)

    def prediction(self, latent: jnp.ndarray):
        return self._pred(latent)

    def init_reward_hidden(self, batch_size: int):
        z = jnp.zeros((batch_size, self.lstm_hidden_size), jnp.float32)
        return (z, z)

    def _next_latent(self, latent: jnp.ndarray, action: jnp.ndarray) -> jnp.ndarray:
        if self.model_type == "mlp":
            enc = jax.nn.one_hot(action, self.action_space_size, dtype=latent.dtype)
            return self._dyn_torso(jnp.concatenate([latent, enc], axis=-1))
        B, h, w, _ = latent.shape
        planes = jax.nn.one_hot(action, self.action_space_size, dtype=latent.dtype)
        planes = jnp.broadcast_to(planes[:, None, None, :], (B, h, w, self.action_space_size))
        x = jnp.concatenate([latent, planes], axis=-1)
        x = self._dyn_conv(x)
        x = self._dyn_norm(x)
        x = nn.relu(x + latent)
        for blk in self._dyn_blocks:
            x = blk(x)
        return x

    def dynamics(self, latent, reward_hidden, action):
        """→ (next_latent, (c', h'), value_prefix_logits)."""
        next_latent = self._next_latent(latent, action)
        if self.model_type == "mlp":
            lstm_in = next_latent
        else:
            r = self._vp_reduce(next_latent)
            r = self._vp_reduce_norm(r)
            r = nn.relu(r)
            lstm_in = r.reshape(r.shape[0], -1)
        carry, out = self._lstm(reward_hidden, lstm_in)
        vp = self._vp_norm(out)
        vp = nn.relu(vp)
        value_prefix_logits = self._vp_head(vp)
        return next_latent, carry, value_prefix_logits

    def initial_inference(self, obs: jnp.ndarray) -> EZNetworkOutput:
        latent = self._repr(obs)
        value_logits, policy_logits = self._pred(latent)
        B = latent.shape[0]
        return EZNetworkOutput(
            value_logits=value_logits,
            value_prefix_logits=jnp.zeros(
                (B, self.reward_support_size), value_logits.dtype
            ),
            policy_logits=policy_logits,
            latent_state=latent,
            reward_hidden=self.init_reward_hidden(B),
        )

    def recurrent_inference(self, latent, reward_hidden, action) -> EZNetworkOutput:
        next_latent, carry, value_prefix_logits = self.dynamics(latent, reward_hidden, action)
        value_logits, policy_logits = self._pred(next_latent)
        return EZNetworkOutput(
            value_logits=value_logits,
            value_prefix_logits=value_prefix_logits,
            policy_logits=policy_logits,
            latent_state=next_latent,
            reward_hidden=carry,
        )

    def project(self, latent: jnp.ndarray, with_grad: bool = True) -> jnp.ndarray:
        return self._proj(latent, with_grad)

    def __call__(self, obs, action):
        out = self.initial_inference(obs)
        rec = self.recurrent_inference(out.latent_state, out.reward_hidden, action)
        self._proj(rec.latent_state, True)
        self._proj(rec.latent_state, False)
        return rec

    def init_params(self, rng: jax.Array, batch_size: int = 1):
        if self.model_type == "mlp":
            obs = jnp.zeros((batch_size, int(self.observation_shape)), jnp.float32)
        else:
            obs = jnp.zeros((batch_size,) + tuple(self.observation_shape), jnp.float32)
        return self.init(rng, obs, jnp.zeros((batch_size,), jnp.int32))

    @staticmethod
    def from_config(model_cfg) -> "EfficientZeroModel":
        obs_shape = model_cfg.get("observation_shape", 4)
        if isinstance(obs_shape, (list, tuple)):
            obs_shape = tuple(obs_shape)
        kwargs = dict(
            observation_shape=obs_shape,
            action_space_size=model_cfg.get("action_space_size", 2),
            model_type=model_cfg.get("model_type", "mlp"),
            latent_state_dim=model_cfg.get("latent_state_dim", 256),
            lstm_hidden_size=model_cfg.get("lstm_hidden_size", 512),
            norm_type=model_cfg.get("norm_type", "LN"),
            num_channels=model_cfg.get("num_channels", 64),
            num_res_blocks=model_cfg.get("num_res_blocks", 1),
            downsample=model_cfg.get("downsample", True),
        )
        for k in ("value_support_size", "reward_support_size"):
            if k in model_cfg:
                kwargs[k] = model_cfg[k]
        return EfficientZeroModel(**kwargs)
