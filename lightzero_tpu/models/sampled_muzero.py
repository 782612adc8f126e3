"""Sampled MuZero model (flax): MuZero MLP with a continuous Gaussian
policy head (mu, sigma).

Capability-parity rebuild of reference lzero/model/sampled_muzero_model_mlp.py
(and the policy-head conventions of sampled_efficientzero_model_mlp.py):
policy output = concat[mu, raw_sigma] with sigma bounded positive; the
dynamics net consumes the raw continuous action vector (no one-hot).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from lightzero_tpu.models.common import (
    DynamicsNetworkConv,
    MLPTorso,
    NetworkOutput,
    PredictionNetworkConv,
    RepresentationNetworkConv,
    RepresentationNetworkMLP,
    SSLProjector,
)


class SampledMuZeroModel(nn.Module):
    """``model_type='conv'`` is the image twin (reference
    sampled_muzero_model.py): conv ResNet trunk, the continuous action
    broadcast as (B, h, w, action_dim) planes into the conv dynamics, and
    the policy head emitting concat[mu_raw, sigma_raw] over the conv
    prediction trunk."""

    observation_shape: Any = 3
    action_space_size: int = 1  # continuous: action dim; discrete: #actions
    # False = discrete sampled MuZero (reference sampled_muzero_model_mlp.py
    # continuous_action_space=False branch): the policy head emits
    # action_space_size logits, K candidates are drawn without replacement,
    # and the dynamics net consumes the ONE-HOT action encoding
    # (discrete_action_encoding_type='one_hot').
    continuous_action_space: bool = True
    latent_state_dim: int = 128
    value_support_size: int = 601
    reward_support_size: int = 601
    common_layer_num: int = 2
    norm_type: str = "LN"
    last_linear_layer_init_zero: bool = True
    self_supervised_learning_loss: bool = True
    sigma_min: float = 0.1
    # sigma_max 2.0 puts the sigmoid-bounded head's INIT at sigma ~ 1.05,
    # matching the reference's exp(log_sigma) head (ding
    # ReparameterizationHead 'conditioned', sigma=1 at zero-init). With the
    # old cap 1.0 (init 0.55) the K tanh-squashed candidates stop covering
    # the opposite torque sign as soon as mu drifts, and the tanh-jacobian
    # density inflation locks the search into one-sided saturation
    # (diagnosed on Pendulum: mu -> -0.9 in every state within 1k iters).
    sigma_max: float = 2.0
    model_type: str = "mlp"  # 'mlp' | 'conv'
    num_channels: int = 64
    num_res_blocks: int = 1
    downsample: bool = True
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
        if self.model_type == "conv":
            self._setup_conv()
            self._proj = SSLProjector()
            return
        L = self.latent_state_dim
        self._repr = RepresentationNetworkMLP(latent_state_dim=L, norm_type=self.norm_type)
        self._dyn_torso = MLPTorso(
            hidden_sizes=(L,) * (self.common_layer_num - 1),
            output_size=L,
            norm_type=self.norm_type,
            output_norm=True,
            output_activation=True,
        )
        self._reward_head = MLPTorso(
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
            # zero-init last layer (reference last_linear_layer_init_zero
            # applies to the policy head too): mu=0 / sigma~1.05 at init. A
            # randomly-init mu head responds to the UNNORMALIZED theta_dot
            # input, locking the collect policy into one spin direction within
            # the first episodes (diagnosed on Pendulum: collect_mu=-0.87
            # before any training).
            self._mu_head = MLPTorso(
                hidden_sizes=(32,), output_size=self.action_space_size, norm_type=self.norm_type,
                last_linear_layer_init_zero=self.last_linear_layer_init_zero,
            )
            self._sigma_head = MLPTorso(
                hidden_sizes=(32,), output_size=self.action_space_size, norm_type=self.norm_type,
                last_linear_layer_init_zero=self.last_linear_layer_init_zero,
            )
        else:
            self._policy_head = MLPTorso(
                hidden_sizes=(32,), output_size=self.action_space_size, norm_type=self.norm_type,
                last_linear_layer_init_zero=self.last_linear_layer_init_zero,
            )
        self._proj = SSLProjector()

    def _setup_conv(self):
        self._repr = RepresentationNetworkConv(
            num_channels=self.num_channels,
            num_res_blocks=self.num_res_blocks,
            downsample=self.downsample,
            norm_type=self.norm_type,
        )
        self._dyn = DynamicsNetworkConv(
            num_channels=self.num_channels,
            num_res_blocks=self.num_res_blocks,
            reward_support_size=self.reward_support_size,
            norm_type=self.norm_type,
            last_linear_layer_init_zero=self.last_linear_layer_init_zero,
        )
        # policy output = concat[mu_raw, sigma_raw] (reference sampled conv
        # models emit 2*action_dim policy units); discrete = A logits
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
        """→ (value_logits, mu, sigma) continuous / (value_logits, logits)
        discrete."""
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

    def _action_encoding(self, action):
        """Continuous: raw (B, D) vector. Discrete: one-hot (B, A)
        (reference discrete_action_encoding_type='one_hot')."""
        if self.continuous_action_space:
            return action
        idx = action.astype(jnp.int32).reshape(action.shape[0])
        return jax.nn.one_hot(idx, self.action_space_size, dtype=jnp.float32)

    def dynamics(self, latent, action):
        """action: (B, action_dim) continuous in [-1, 1], or (B,) int
        discrete."""
        action_vec = self._action_encoding(action)
        if self.model_type == "conv":
            B, h, w, _ = latent.shape
            planes = jnp.broadcast_to(
                action_vec.astype(latent.dtype)[:, None, None, :],
                (B, h, w, action_vec.shape[-1]),
            )
            return self._dyn(latent, planes)
        x = jnp.concatenate([latent, action_vec.astype(latent.dtype)], axis=-1)
        next_latent = self._dyn_torso(x)
        reward_logits = self._reward_head(next_latent)
        return next_latent, reward_logits

    def _policy_out(self, pred):
        if self.continuous_action_space:
            value_logits, mu, sigma = pred
            return value_logits, dict(mu=mu, sigma=sigma)
        value_logits, logits = pred
        return value_logits, dict(policy_logits=logits)

    def initial_inference(self, obs):
        latent = self._repr(obs)
        value_logits, pol = self._policy_out(self.prediction(latent))
        B = latent.shape[0]
        return dict(
            value_logits=value_logits,
            reward_logits=jnp.zeros((B, self.reward_support_size), value_logits.dtype),
            latent_state=latent,
            **pol,
        )

    def recurrent_inference(self, latent, action):
        next_latent, reward_logits = self.dynamics(latent, action)
        value_logits, pol = self._policy_out(self.prediction(next_latent))
        return dict(
            value_logits=value_logits,
            reward_logits=reward_logits,
            latent_state=next_latent,
            **pol,
        )

    def project(self, latent, with_grad: bool = True):
        return self._proj(latent, with_grad)

    def __call__(self, obs, action_vec):
        out = self.initial_inference(obs)
        rec = self.recurrent_inference(out["latent_state"], action_vec)
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
    def from_config(model_cfg) -> "SampledMuZeroModel":
        obs_shape = model_cfg.get("observation_shape", 3)
        default_type = "conv" if isinstance(obs_shape, (list, tuple)) else "mlp"
        kwargs = dict(
            observation_shape=tuple(obs_shape) if isinstance(obs_shape, (list, tuple)) else obs_shape,
            action_space_size=model_cfg.get("action_space_size", 1),
            continuous_action_space=model_cfg.get("continuous_action_space", True),
            latent_state_dim=model_cfg.get("latent_state_dim", 128),
            norm_type=model_cfg.get("norm_type", "LN"),
            model_type=model_cfg.get("model_type", default_type),
        )
        for k in ("value_support_size", "reward_support_size", "sigma_min", "sigma_max",
                  "sigma_type", "fixed_sigma_value", "bound_mu", "num_channels",
                  "num_res_blocks", "downsample"):
            if k in model_cfg:
                kwargs[k] = model_cfg[k]
        return SampledMuZeroModel(**kwargs)
