"""Stochastic MuZero model (flax): decision/chance alternation.

Capability-parity rebuild of reference lzero/model/stochastic_muzero_model.py
(+_mlp): MuZero nets plus ``afterstate_dynamics`` (:384, latent ⊕ action →
afterstate), ``afterstate_prediction`` (:314, afterstate → Q logits + chance
distribution logits), ``dynamics`` (afterstate ⊕ chance → next latent +
reward), and a ``chance_encoder`` (:293,686) over consecutive observation
pairs with straight-through one-hot argmax (:776-795).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lightzero_tpu.models.common import (
    MLPTorso,
    PredictionNetworkConv,
    PredictionNetworkMLP,
    RepresentationNetworkConv,
    RepresentationNetworkMLP,
    ResBlock,
)


class StochasticMZOutput(NamedTuple):
    value_logits: jnp.ndarray
    reward_logits: jnp.ndarray
    policy_logits: jnp.ndarray  # action policy (decision) or chance logits (afterstate)
    latent_state: jnp.ndarray


class StochasticMuZeroModel(nn.Module):
    """``model_type='mlp'``: vector obs (e.g. flattened 2048 planes).
    ``model_type='conv'``: image twin (reference stochastic_muzero_model.py
    :1-835) — conv ResNet trunk, one-hot action/chance broadcast planes into
    conv dynamics/afterstate-dynamics, conv chance encoder over stacked
    consecutive frames (ChanceEncoderBackbone :686)."""

    observation_shape: Any = 256
    action_space_size: int = 4
    chance_space_size: int = 32
    latent_state_dim: int = 256
    value_support_size: int = 601
    reward_support_size: int = 601
    common_layer_num: int = 2
    norm_type: str = "LN"
    last_linear_layer_init_zero: bool = True
    model_type: str = "mlp"  # 'mlp' | 'conv'
    num_channels: int = 64
    num_res_blocks: int = 1
    downsample: bool = True

    def _conv_dyn_stack(self):
        return (
            nn.Conv(self.num_channels, (3, 3), padding="SAME", use_bias=False),
            nn.LayerNorm(),
            [ResBlock(self.num_channels, self.norm_type) for _ in range(self.num_res_blocks)],
        )

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
                action_space_size=self.action_space_size,
                value_support_size=self.value_support_size,
                num_res_blocks=self.num_res_blocks,
                num_channels=self.num_channels,
                norm_type=self.norm_type,
                last_linear_layer_init_zero=self.last_linear_layer_init_zero,
            )
            self._afterstate_pred = PredictionNetworkConv(
                action_space_size=self.chance_space_size,
                value_support_size=self.value_support_size,
                num_res_blocks=self.num_res_blocks,
                num_channels=self.num_channels,
                norm_type=self.norm_type,
                last_linear_layer_init_zero=self.last_linear_layer_init_zero,
            )
            self._as_dyn_conv, self._as_dyn_norm, self._as_dyn_blocks = self._conv_dyn_stack()
            self._dyn_conv, self._dyn_norm, self._dyn_blocks = self._conv_dyn_stack()
            self._reward_reduce = nn.Conv(16, (1, 1), use_bias=False)
            self._reward_reduce_norm = nn.LayerNorm()
            self._reward_head = MLPTorso(
                hidden_sizes=(32,),
                output_size=self.reward_support_size,
                norm_type=self.norm_type,
                last_linear_layer_init_zero=self.last_linear_layer_init_zero,
            )
            # chance encoder: small conv backbone over the stacked frame pair
            # (ChanceEncoderBackbone, stochastic_muzero_model.py:686)
            self._chance_conv = nn.Conv(self.num_channels, (3, 3), strides=(2, 2), use_bias=False)
            self._chance_norm = nn.LayerNorm()
            self._chance_head = MLPTorso(
                hidden_sizes=(L,),
                output_size=self.chance_space_size,
                norm_type=self.norm_type,
            )
            return
        self._repr = RepresentationNetworkMLP(latent_state_dim=L, norm_type=self.norm_type)
        self._pred = PredictionNetworkMLP(
            action_space_size=self.action_space_size,
            value_support_size=self.value_support_size,
            common_layer_num=self.common_layer_num,
            norm_type=self.norm_type,
            last_linear_layer_init_zero=self.last_linear_layer_init_zero,
        )
        # afterstate value/chance heads
        self._afterstate_pred = PredictionNetworkMLP(
            action_space_size=self.chance_space_size,
            value_support_size=self.value_support_size,
            common_layer_num=self.common_layer_num,
            norm_type=self.norm_type,
            last_linear_layer_init_zero=self.last_linear_layer_init_zero,
        )
        self._afterstate_dyn = MLPTorso(
            hidden_sizes=(L,) * (self.common_layer_num - 1),
            output_size=L,
            norm_type=self.norm_type,
            output_norm=True,
            output_activation=True,
        )
        self._dyn = MLPTorso(
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
        self._chance_encoder = MLPTorso(
            hidden_sizes=(L,),
            output_size=self.chance_space_size,
            norm_type=self.norm_type,
        )

    # ------------------------------------------------------------------ api
    def representation(self, obs: jnp.ndarray) -> jnp.ndarray:
        return self._repr(obs)

    def prediction(self, latent: jnp.ndarray):
        return self._pred(latent)

    def _conv_apply(self, conv, norm, blocks, latent, onehot, width):
        B, h, w, _ = latent.shape
        planes = jnp.broadcast_to(onehot[:, None, None, :], (B, h, w, width))
        x = conv(jnp.concatenate([latent, planes], axis=-1))
        x = norm(x)
        x = nn.relu(x + latent)
        for blk in blocks:
            x = blk(x)
        return x

    def afterstate_dynamics(self, latent: jnp.ndarray, action: jnp.ndarray) -> jnp.ndarray:
        enc = jax.nn.one_hot(action, self.action_space_size, dtype=latent.dtype)
        if self.model_type == "conv":
            return self._conv_apply(
                self._as_dyn_conv, self._as_dyn_norm, self._as_dyn_blocks,
                latent, enc, self.action_space_size,
            )
        return self._afterstate_dyn(jnp.concatenate([latent, enc], axis=-1))

    def afterstate_prediction(self, afterstate: jnp.ndarray):
        """→ (value_logits, chance_logits)."""
        return self._afterstate_pred(afterstate)

    def dynamics(self, afterstate: jnp.ndarray, chance: jnp.ndarray):
        enc = jax.nn.one_hot(chance, self.chance_space_size, dtype=afterstate.dtype)
        if self.model_type == "conv":
            next_latent = self._conv_apply(
                self._dyn_conv, self._dyn_norm, self._dyn_blocks,
                afterstate, enc, self.chance_space_size,
            )
            r = nn.relu(self._reward_reduce_norm(self._reward_reduce(next_latent)))
            reward_logits = self._reward_head(r.reshape(r.shape[0], -1))
            return next_latent, reward_logits
        next_latent = self._dyn(jnp.concatenate([afterstate, enc], axis=-1))
        reward_logits = self._reward_head(next_latent)
        return next_latent, reward_logits

    def chance_encode(self, obs_pair: jnp.ndarray):
        """Consecutive frames — (B, 2*obs_dim) for mlp, (B, H, W, 2C) for
        conv — → (logits, straight-through onehot)
        (reference ChanceEncoder, stochastic_muzero_model.py:776-795)."""
        if self.model_type == "conv":
            x = nn.relu(self._chance_norm(self._chance_conv(obs_pair)))
            logits = self._chance_head(x.reshape(x.shape[0], -1))
        else:
            logits = self._chance_encoder(obs_pair)
        onehot = jax.nn.one_hot(jnp.argmax(logits, -1), self.chance_space_size, dtype=logits.dtype)
        soft = jax.nn.softmax(logits, -1)
        st_onehot = soft + jax.lax.stop_gradient(onehot - soft)
        return logits, st_onehot

    def initial_inference(self, obs: jnp.ndarray) -> StochasticMZOutput:
        latent = self._repr(obs)
        value_logits, policy_logits = self._pred(latent)
        return StochasticMZOutput(
            value_logits=value_logits,
            reward_logits=jnp.zeros((latent.shape[0], self.reward_support_size), value_logits.dtype),
            policy_logits=policy_logits,
            latent_state=latent,
        )

    def recurrent_inference(
        self, latent: jnp.ndarray, action: jnp.ndarray, afterstate: bool = False
    ) -> StochasticMZOutput:
        """afterstate=False: decision step (latent, action → afterstate,
        chance logits, Q). afterstate=True: chance step (afterstate, chance →
        latent, reward, value, policy). Mirrors reference recurrent_inference
        dispatch (stochastic_muzero_model.py)."""
        if afterstate:
            next_latent, reward_logits = self.dynamics(latent, action)
            value_logits, policy_logits = self._pred(next_latent)
            return StochasticMZOutput(value_logits, reward_logits, policy_logits, next_latent)
        as_latent = self.afterstate_dynamics(latent, action)
        value_logits, chance_logits = self._afterstate_pred(as_latent)
        B = latent.shape[0]
        return StochasticMZOutput(
            value_logits,
            jnp.zeros((B, self.reward_support_size), value_logits.dtype),
            chance_logits,
            as_latent,
        )

    def __call__(self, obs, action):
        out = self.initial_inference(obs)
        dec = self.recurrent_inference(out.latent_state, action, afterstate=False)
        cha = self.recurrent_inference(dec.latent_state, action, afterstate=True)
        self.chance_encode(jnp.concatenate([obs, obs], axis=-1))
        return cha

    def init_params(self, rng: jax.Array, batch_size: int = 1):
        if self.model_type == "conv":
            obs = jnp.zeros((batch_size,) + tuple(self.observation_shape), jnp.float32)
        else:
            obs = jnp.zeros((batch_size, int(self.observation_shape)), jnp.float32)
        return self.init(rng, obs, jnp.zeros((batch_size,), jnp.int32))

    @staticmethod
    def from_config(model_cfg) -> "StochasticMuZeroModel":
        obs_shape = model_cfg.get("observation_shape", 256)
        default_type = "conv" if isinstance(obs_shape, (list, tuple)) else "mlp"
        kwargs = dict(
            observation_shape=tuple(obs_shape) if isinstance(obs_shape, (list, tuple)) else obs_shape,
            action_space_size=model_cfg.get("action_space_size", 4),
            chance_space_size=model_cfg.get("chance_space_size", 32),
            latent_state_dim=model_cfg.get("latent_state_dim", 256),
            norm_type=model_cfg.get("norm_type", "LN"),
            model_type=model_cfg.get("model_type", default_type),
        )
        for k in ("value_support_size", "reward_support_size", "num_channels",
                  "num_res_blocks", "downsample"):
            if k in model_cfg:
                kwargs[k] = model_cfg[k]
        return StochasticMuZeroModel(**kwargs)
