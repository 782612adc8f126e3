"""Sampled EfficientZero model (flax): continuous Gaussian policy head +
LSTM value-prefix dynamics.

Capability-parity rebuild of reference
lzero/model/sampled_efficientzero_model_mlp.py: the SampledMuZero heads
(mu, sigma) over an EfficientZero backbone whose dynamics thread the
reward-hidden LSTM state and predict value_prefix.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from lightzero_tpu.models.common import (
    MLPTorso,
    PredictionNetworkConv,
    RepresentationNetworkConv,
    RepresentationNetworkMLP,
    ResBlock,
    SSLProjector,
)


class SampledEfficientZeroModel(nn.Module):
    """``model_type='conv'`` is the image twin (reference
    sampled_efficientzero_model.py): conv ResNet trunk, continuous action
    broadcast as planes into the conv dynamics, value-prefix LSTM fed by a
    1×1-conv reduction, and concat[mu_raw, sigma_raw] policy output."""

    observation_shape: Any = 3
    action_space_size: int = 1  # continuous: action dim; discrete: #actions
    # False = discrete sampled EfficientZero (reference
    # sampled_efficientzero_model_mlp.py continuous_action_space=False): the
    # policy head emits A logits and the dynamics consumes one-hot actions.
    continuous_action_space: bool = True
    latent_state_dim: int = 128
    lstm_hidden_size: int = 256
    value_support_size: int = 601
    reward_support_size: int = 601
    common_layer_num: int = 2
    norm_type: str = "LN"
    last_linear_layer_init_zero: bool = True
    model_type: str = "mlp"  # 'mlp' | 'conv'
    num_channels: int = 64
    num_res_blocks: int = 1
    downsample: bool = True
    sigma_min: float = 0.1
    # sigma_max 2.0 puts the sigmoid-bounded head's INIT at sigma ~ 1.05,
    # matching the reference's exp(log_sigma) head (ding
    # ReparameterizationHead 'conditioned', sigma=1 at zero-init). With the
    # old cap 1.0 (init 0.55) the K tanh-squashed candidates stop covering
    # the opposite torque sign as soon as mu drifts, and the tanh-jacobian
    # density inflation locks the search into one-sided saturation
    # (diagnosed on Pendulum: mu -> -0.9 in every state within 1k iters).
    sigma_max: float = 2.0
    # 'conditioned' (learned, bounded [sigma_min, sigma_max]) or 'fixed'
    # (reference sigma_type/fixed_sigma_value,
    # sampled_efficientzero_model_mlp.py:42-43 — fixed sigma prevents the
    # variance-collapse failure mode on pendulum-like tasks)
    sigma_type: str = "conditioned"
    fixed_sigma_value: float = 0.3
    # bound the pre-squash mean so tanh(mu) cannot saturate (caps the
    # tanh-jacobian density blow-up; reference bound_type)
    bound_mu: bool = True

    def setup(self):
        L = self.latent_state_dim
        if self.model_type == "conv":
            self._repr = RepresentationNetworkConv(
                num_channels=self.num_channels,
                num_res_blocks=self.num_res_blocks,
                downsample=self.downsample,
                norm_type=self.norm_type,
            )
            self._pred = PredictionNetworkConv(
                action_space_size=(
                    2 * self.action_space_size
                    if self.continuous_action_space
                    else self.action_space_size
                ),
                value_support_size=self.value_support_size,
                num_res_blocks=self.num_res_blocks,
                num_channels=self.num_channels,
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
            self._lstm = nn.OptimizedLSTMCell(features=self.lstm_hidden_size)
            self._vp_norm = nn.LayerNorm()
            self._vp_head = MLPTorso(
                hidden_sizes=(32,),
                output_size=self.reward_support_size,
                norm_type=self.norm_type,
                last_linear_layer_init_zero=self.last_linear_layer_init_zero,
            )
            self._proj = SSLProjector()
            return
        self._repr = RepresentationNetworkMLP(latent_state_dim=L, norm_type=self.norm_type)
        self._dyn_torso = MLPTorso(
            hidden_sizes=(L,) * (self.common_layer_num - 1),
            output_size=L,
            norm_type=self.norm_type,
            output_norm=True,
            output_activation=True,
        )
        self._lstm = nn.OptimizedLSTMCell(features=self.lstm_hidden_size)
        self._vp_norm = nn.LayerNorm()
        self._vp_head = MLPTorso(
            hidden_sizes=(32,),
            output_size=self.reward_support_size,
            norm_type=self.norm_type,
            last_linear_layer_init_zero=self.last_linear_layer_init_zero,
        )
        self._common = MLPTorso(
            hidden_sizes=(L,) * (self.common_layer_num - 1),
            output_size=L,
            norm_type=self.norm_type,
            output_norm=True,
            output_activation=True,
        )
        self._value_head = MLPTorso(
            hidden_sizes=(32,),
            output_size=self.value_support_size,
            norm_type=self.norm_type,
            last_linear_layer_init_zero=self.last_linear_layer_init_zero,
        )
        if self.continuous_action_space:
            # zero-init policy heads (see sampled_muzero.py: prevents the
            # theta_dot-driven spin lock-in at init)
            self._mu_head = MLPTorso(hidden_sizes=(32,), output_size=self.action_space_size,
                                     norm_type=self.norm_type,
                                     last_linear_layer_init_zero=self.last_linear_layer_init_zero)
            self._sigma_head = MLPTorso(hidden_sizes=(32,), output_size=self.action_space_size,
                                        norm_type=self.norm_type,
                                        last_linear_layer_init_zero=self.last_linear_layer_init_zero)
        else:
            self._policy_head = MLPTorso(hidden_sizes=(32,), output_size=self.action_space_size,
                                         norm_type=self.norm_type,
                                         last_linear_layer_init_zero=self.last_linear_layer_init_zero)
        self._proj = SSLProjector()

    def representation(self, obs):
        return self._repr(obs)

    def _mu_sigma(self, mu_raw, sigma_raw):
        mu = mu_raw
        if self.bound_mu:
            mu = 1.5 * jnp.tanh(mu)  # tanh(1.5) ~ 0.905 caps squash saturation
        if self.sigma_type == "fixed":
            sigma = jnp.full_like(mu, self.fixed_sigma_value)
        else:
            sigma = self.sigma_min + (self.sigma_max - self.sigma_min) * jax.nn.sigmoid(
                sigma_raw
            )
        return mu, sigma

    def prediction(self, latent):
        if self.model_type == "conv":
            value_logits, ms = self._pred(latent)
            if not self.continuous_action_space:
                return value_logits, ms
            mu_raw, sigma_raw = jnp.split(ms, 2, axis=-1)
            mu, sigma = self._mu_sigma(mu_raw, sigma_raw)
            return value_logits, mu, sigma
        x = self._common(latent)
        value_logits = self._value_head(x)
        if not self.continuous_action_space:
            return value_logits, self._policy_head(x)
        mu, sigma = self._mu_sigma(self._mu_head(x), self._sigma_head(x))
        return value_logits, mu, sigma

    def _policy_out(self, pred):
        if self.continuous_action_space:
            value_logits, mu, sigma = pred
            return value_logits, dict(mu=mu, sigma=sigma)
        value_logits, logits = pred
        return value_logits, dict(policy_logits=logits)

    def _action_encoding(self, action):
        if self.continuous_action_space:
            return action
        idx = action.astype(jnp.int32).reshape(action.shape[0])
        return jax.nn.one_hot(idx, self.action_space_size, dtype=jnp.float32)

    def init_reward_hidden(self, batch_size: int):
        z = jnp.zeros((batch_size, self.lstm_hidden_size), jnp.float32)
        return (z, z)

    def dynamics(self, latent, reward_hidden, action):
        action_vec = self._action_encoding(action)
        if self.model_type == "conv":
            B, h, w, _ = latent.shape
            planes = jnp.broadcast_to(
                action_vec.astype(latent.dtype)[:, None, None, :],
                (B, h, w, action_vec.shape[-1]),
            )
            x = jnp.concatenate([latent, planes], axis=-1)
            x = self._dyn_conv(x)
            x = self._dyn_norm(x)
            x = nn.relu(x + latent)
            for blk in self._dyn_blocks:
                x = blk(x)
            next_latent = x
            r = nn.relu(self._vp_reduce_norm(self._vp_reduce(next_latent)))
            lstm_in = r.reshape(r.shape[0], -1)
        else:
            x = jnp.concatenate([latent, action_vec.astype(latent.dtype)], axis=-1)
            next_latent = self._dyn_torso(x)
            lstm_in = next_latent
        carry, out = self._lstm(reward_hidden, lstm_in)
        vp = nn.relu(self._vp_norm(out))
        value_prefix_logits = self._vp_head(vp)
        return next_latent, carry, value_prefix_logits

    def initial_inference(self, obs):
        latent = self._repr(obs)
        value_logits, pol = self._policy_out(self.prediction(latent))
        B = latent.shape[0]
        return dict(
            value_logits=value_logits,
            value_prefix_logits=jnp.zeros((B, self.reward_support_size), value_logits.dtype),
            latent_state=latent,
            reward_hidden=self.init_reward_hidden(B),
            **pol,
        )

    def recurrent_inference(self, latent, reward_hidden, action):
        next_latent, carry, value_prefix_logits = self.dynamics(latent, reward_hidden, action)
        value_logits, pol = self._policy_out(self.prediction(next_latent))
        return dict(
            value_logits=value_logits,
            value_prefix_logits=value_prefix_logits,
            latent_state=next_latent,
            reward_hidden=carry,
            **pol,
        )

    def project(self, latent, with_grad: bool = True):
        return self._proj(latent, with_grad)

    def __call__(self, obs, action_vec):
        out = self.initial_inference(obs)
        rec = self.recurrent_inference(out["latent_state"], out["reward_hidden"], action_vec)
        self._proj(rec["latent_state"], True)
        self._proj(rec["latent_state"], False)
        return rec

    def init_params(self, rng, batch_size: int = 1):
        if self.model_type == "conv":
            obs = jnp.zeros((batch_size,) + tuple(self.observation_shape), jnp.float32)
        else:
            obs = jnp.zeros((batch_size, int(self.observation_shape)), jnp.float32)
        if self.continuous_action_space:
            act = jnp.zeros((batch_size, self.action_space_size), jnp.float32)
        else:
            act = jnp.zeros((batch_size,), jnp.int32)
        return self.init(rng, obs, act)

    @staticmethod
    def from_config(model_cfg) -> "SampledEfficientZeroModel":
        obs_shape = model_cfg.get("observation_shape", 3)
        default_type = "conv" if isinstance(obs_shape, (list, tuple)) else "mlp"
        kwargs = dict(
            observation_shape=tuple(obs_shape) if isinstance(obs_shape, (list, tuple)) else obs_shape,
            action_space_size=model_cfg.get("action_space_size", 1),
            continuous_action_space=model_cfg.get("continuous_action_space", True),
            latent_state_dim=model_cfg.get("latent_state_dim", 128),
            lstm_hidden_size=model_cfg.get("lstm_hidden_size", 256),
            norm_type=model_cfg.get("norm_type", "LN"),
            model_type=model_cfg.get("model_type", default_type),
        )
        for k in ("value_support_size", "reward_support_size", "sigma_min", "sigma_max",
                  "sigma_type", "fixed_sigma_value", "bound_mu", "num_channels",
                  "num_res_blocks", "downsample"):
            if k in model_cfg:
                kwargs[k] = model_cfg[k]
        return SampledEfficientZeroModel(**kwargs)
