"""MuZero-RNN-full-obs model (flax).

Capability-parity rebuild of reference lzero/model/muzero_rnn_full_obs_model.py
(651 LoC) + the MuZeroRNNFullObsMCTSCtree driver (mcts_ctree.py:468-666):
the world model carries a GRU latent history through both real steps and
search steps — dynamics consume (latent, history_h, action) and emit
(next_latent, h'). In this framework the history state simply rides the
search embedding pytree, exactly like EfficientZero's LSTM state.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from lightzero_tpu.models.common import MLPTorso, RepresentationNetworkMLP, SSLProjector


class MuZeroRNNModel(nn.Module):
    observation_shape: Any = 4
    action_space_size: int = 2
    latent_state_dim: int = 128
    rnn_hidden_size: int = 128
    value_support_size: int = 601
    reward_support_size: int = 601
    common_layer_num: int = 2
    norm_type: str = "LN"
    last_linear_layer_init_zero: bool = True

    def setup(self):
        L = self.latent_state_dim
        self._repr = RepresentationNetworkMLP(latent_state_dim=L, norm_type=self.norm_type)
        self._gru = nn.GRUCell(features=self.rnn_hidden_size)
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
        self._policy_head = MLPTorso(
            hidden_sizes=(32,),
            output_size=self.action_space_size,
            norm_type=self.norm_type,
            last_linear_layer_init_zero=self.last_linear_layer_init_zero,
        )
        self._proj = SSLProjector()

    def representation(self, obs):
        return self._repr(obs)

    def init_history(self, batch_size: int):
        return jnp.zeros((batch_size, self.rnn_hidden_size), jnp.float32)

    def prediction(self, latent, history):
        x = self._common(jnp.concatenate([latent, history], axis=-1))
        return self._value_head(x), self._policy_head(x)

    def dynamics(self, latent, history, action):
        enc = jax.nn.one_hot(action, self.action_space_size, dtype=latent.dtype)
        next_latent = self._dyn_torso(jnp.concatenate([latent, enc], axis=-1))
        new_history = self._gru(history, next_latent)[0]
        reward_logits = self._reward_head(jnp.concatenate([next_latent, new_history], axis=-1))
        return next_latent, new_history, reward_logits

    def initial_inference(self, obs):
        latent = self._repr(obs)
        B = latent.shape[0]
        history = self.init_history(B)
        value_logits, policy_logits = self.prediction(latent, history)
        return dict(
            value_logits=value_logits,
            reward_logits=jnp.zeros((B, self.reward_support_size), value_logits.dtype),
            policy_logits=policy_logits,
            latent_state=latent,
            history=history,
        )

    def recurrent_inference(self, latent, history, action):
        next_latent, new_history, reward_logits = self.dynamics(latent, history, action)
        value_logits, policy_logits = self.prediction(next_latent, new_history)
        return dict(
            value_logits=value_logits,
            reward_logits=reward_logits,
            policy_logits=policy_logits,
            latent_state=next_latent,
            history=new_history,
        )

    def project(self, latent, with_grad: bool = True):
        return self._proj(latent, with_grad)

    def __call__(self, obs, action):
        out = self.initial_inference(obs)
        rec = self.recurrent_inference(out["latent_state"], out["history"], action)
        self._proj(rec["latent_state"], True)
        self._proj(rec["latent_state"], False)
        return rec

    def init_params(self, rng, batch_size: int = 1):
        obs = jnp.zeros((batch_size, int(self.observation_shape)), jnp.float32)
        return self.init(rng, obs, jnp.zeros((batch_size,), jnp.int32))

    @staticmethod
    def from_config(model_cfg) -> "MuZeroRNNModel":
        kwargs = dict(
            observation_shape=model_cfg.get("observation_shape", 4),
            action_space_size=model_cfg.get("action_space_size", 2),
            latent_state_dim=model_cfg.get("latent_state_dim", 128),
            rnn_hidden_size=model_cfg.get("rnn_hidden_size", 128),
            norm_type=model_cfg.get("norm_type", "LN"),
        )
        for k in ("value_support_size", "reward_support_size"):
            if k in model_cfg:
                kwargs[k] = model_cfg[k]
        return MuZeroRNNModel(**kwargs)
