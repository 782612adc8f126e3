"""MuZero model (flax): representation + dynamics + prediction.

Capability-parity rebuild of reference lzero/model/muzero_model.py (conv,
:210 initial_inference, :242 recurrent_inference) and muzero_model_mlp.py,
as one module with ``model_type`` in {'mlp','conv'}. Methods are exposed as
pure functions over params via ``Module.apply(..., method=...)`` so they can
be fused into the jitted search and train step.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lightzero_tpu.models.common import (
    DynamicsNetworkConv,
    DynamicsNetworkMLP,
    NetworkOutput,
    PredictionNetworkConv,
    PredictionNetworkMLP,
    RepresentationNetworkConv,
    RepresentationNetworkMLP,
    SSLProjector,
)

MuZeroParams = Any


class MuZeroModel(nn.Module):
    """MuZero network family.

    observation_shape: int (mlp) or (H, W, C) tuple (conv, NHWC with
    C = frame_stack * image_channels, the reference's stacked-frame input
    transposed from its NCHW).
    """

    observation_shape: Any = 4
    action_space_size: int = 2
    model_type: str = "mlp"  # 'mlp' | 'conv'
    latent_state_dim: int = 256
    value_support_size: int = 601
    reward_support_size: int = 601
    # mlp
    common_layer_num: int = 2
    reward_head_hidden_channels: Sequence[int] = (32,)
    value_head_hidden_channels: Sequence[int] = (32,)
    policy_head_hidden_channels: Sequence[int] = (32,)
    res_connection_in_dynamics: bool = False
    # conv
    num_channels: int = 64
    num_res_blocks: int = 1
    downsample: bool = True
    reward_head_channels: int = 16
    value_head_channels: int = 16
    policy_head_channels: int = 16
    # shared
    norm_type: str = "LN"
    self_supervised_learning_loss: bool = False
    last_linear_layer_init_zero: bool = True
    discrete_action_encoding_type: str = "one_hot"
    proj_hid: int = 1024
    proj_out: int = 1024
    pred_hid: int = 512
    pred_out: int = 1024
    # HarmonyDream learnable loss weights (reference muzero.py:325-331):
    # loss_i is divided by exp(h_i) with a log(exp(h_i)+1) regularizer
    harmony_balance: bool = False
    # multitask twin (reference muzero_model_multitask.py: shared trunk,
    # task-routed heads). TPU-native redesign: a learned task embedding is
    # added IN-BAND to the root latent, so one static-shape network serves
    # every task and the dynamics carry the conditioning forward — no
    # per-task head branches to re-trace.
    num_tasks: int = 0

    def setup(self):
        if self.harmony_balance:
            zero = nn.initializers.zeros
            self.harmony_policy = self.param("harmony_policy", zero, ())
            self.harmony_value = self.param("harmony_value", zero, ())
            self.harmony_reward = self.param("harmony_reward", zero, ())
        if self.model_type == "mlp":
            self._repr = RepresentationNetworkMLP(
                latent_state_dim=self.latent_state_dim, norm_type=self.norm_type
            )
            self._dyn = DynamicsNetworkMLP(
                latent_state_dim=self.latent_state_dim,
                reward_support_size=self.reward_support_size,
                common_layer_num=self.common_layer_num,
                reward_head_hidden_channels=self.reward_head_hidden_channels,
                norm_type=self.norm_type,
                res_connection_in_dynamics=self.res_connection_in_dynamics,
                last_linear_layer_init_zero=self.last_linear_layer_init_zero,
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
        elif self.model_type == "conv":
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
                reward_head_hidden_channels=self.reward_head_hidden_channels,
                reward_head_channels=self.reward_head_channels,
                norm_type=self.norm_type,
                last_linear_layer_init_zero=self.last_linear_layer_init_zero,
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
        else:
            raise ValueError(f"unknown model_type {self.model_type!r}")
        if self.self_supervised_learning_loss:
            self._proj = SSLProjector(
                proj_hid=self.proj_hid,
                proj_out=self.proj_out,
                pred_hid=self.pred_hid,
                pred_out=self.pred_out,
            )
        if self.num_tasks > 0:
            dim = (
                self.latent_state_dim if self.model_type == "mlp" else self.num_channels
            )
            self._task_embed = nn.Embed(self.num_tasks, dim, name="task_embed")

    # --- action encodings -------------------------------------------------
    def _encode_action_mlp(self, action: jnp.ndarray, dtype) -> jnp.ndarray:
        if self.discrete_action_encoding_type == "one_hot":
            return jax.nn.one_hot(action, self.action_space_size, dtype=dtype)
        # 'not_one_hot': scalar action / A (reference muzero_model_mlp.py:91)
        return (action.astype(dtype) / self.action_space_size)[:, None]

    def _encode_action_conv(self, action: jnp.ndarray, latent: jnp.ndarray) -> jnp.ndarray:
        B, h, w, _ = latent.shape
        if self.discrete_action_encoding_type == "one_hot":
            planes = jax.nn.one_hot(action, self.action_space_size, dtype=latent.dtype)
            return jnp.broadcast_to(planes[:, None, None, :], (B, h, w, self.action_space_size))
        plane = (action.astype(latent.dtype) / self.action_space_size)[:, None, None, None]
        return jnp.broadcast_to(plane, (B, h, w, 1))

    # --- core methods ------------------------------------------------------
    def _condition_on_task(self, latent: jnp.ndarray, task_id) -> jnp.ndarray:
        """Add the task embedding to the latent (mlp: feature add; conv:
        per-channel bias broadcast over space)."""
        if self.num_tasks == 0 or task_id is None:
            return latent
        e = self._task_embed(jnp.asarray(task_id, jnp.int32))
        if latent.ndim == 4:  # (B, h, w, c)
            e = e[:, None, None, :]
        return latent + e

    def representation(self, obs: jnp.ndarray, task_id=None) -> jnp.ndarray:
        return self._condition_on_task(self._repr(obs), task_id)

    def dynamics(self, latent: jnp.ndarray, action: jnp.ndarray):
        if self.model_type == "mlp":
            enc = self._encode_action_mlp(action, latent.dtype)
        else:
            enc = self._encode_action_conv(action, latent)
        return self._dyn(latent, enc)

    def prediction(self, latent: jnp.ndarray):
        return self._pred(latent)

    def initial_inference(self, obs: jnp.ndarray, task_id=None) -> NetworkOutput:
        """reference muzero_model.py:210 — reward is a zero pad at the root.
        ``task_id`` (B,) conditions the root latent in multitask runs
        (muzero_model_multitask.py role); the dynamics net carries the
        conditioning through the unroll in-band."""
        latent = self.representation(obs, task_id)
        value_logits, policy_logits = self._pred(latent)
        return NetworkOutput(
            value_logits=value_logits,
            reward_logits=jnp.zeros_like(value_logits[..., : self.reward_support_size]),
            policy_logits=policy_logits,
            latent_state=latent,
        )

    def recurrent_inference(self, latent: jnp.ndarray, action: jnp.ndarray) -> NetworkOutput:
        """reference muzero_model.py:242."""
        next_latent, reward_logits = self.dynamics(latent, action)
        value_logits, policy_logits = self._pred(next_latent)
        return NetworkOutput(
            value_logits=value_logits,
            reward_logits=reward_logits,
            policy_logits=policy_logits,
            latent_state=next_latent,
        )

    def project(self, latent: jnp.ndarray, with_grad: bool = True) -> jnp.ndarray:
        """SSL projection (reference muzero_model.py:376-413)."""
        return self._proj(latent, with_grad)

    def __call__(self, obs: jnp.ndarray, action: jnp.ndarray):
        """Init-path: touches every submodule so flax creates all params."""
        tid = (
            jnp.zeros((obs.shape[0],), jnp.int32) if self.num_tasks > 0 else None
        )
        out = self.initial_inference(obs, tid)
        rec = self.recurrent_inference(out.latent_state, action)
        if self.self_supervised_learning_loss:
            self._proj(rec.latent_state, True)
            self._proj(rec.latent_state, False)
        return rec

    @staticmethod
    def from_config(model_cfg) -> "MuZeroModel":
        """Build from a cfg.policy.model Config tree (reference-compatible
        key names, lzero/policy/muzero.py:44-130)."""
        obs_shape = model_cfg.get("observation_shape", 4)
        if isinstance(obs_shape, (list, tuple)):
            obs_shape = tuple(obs_shape)
        kwargs = dict(
            observation_shape=obs_shape,
            action_space_size=model_cfg.get("action_space_size", 2),
            model_type=model_cfg.get("model_type", "mlp"),
            latent_state_dim=model_cfg.get("latent_state_dim", 256),
            norm_type=model_cfg.get("norm_type", "LN"),
            self_supervised_learning_loss=model_cfg.get("self_supervised_learning_loss", False),
            discrete_action_encoding_type=model_cfg.get("discrete_action_encoding_type", "one_hot"),
            res_connection_in_dynamics=model_cfg.get("res_connection_in_dynamics", False),
            num_channels=model_cfg.get("num_channels", 64),
            num_res_blocks=model_cfg.get("num_res_blocks", 1),
            downsample=model_cfg.get("downsample", True),
            harmony_balance=model_cfg.get("harmony_balance", False),
            num_tasks=int(model_cfg.get("num_tasks", 0)),
        )
        for k in (
            "value_support_size",
            "reward_support_size",
            "reward_head_hidden_channels",
            "value_head_hidden_channels",
            "policy_head_hidden_channels",
            "proj_hid",
            "proj_out",
            "pred_hid",
            "pred_out",
        ):
            if k in model_cfg:
                v = model_cfg[k]
                kwargs[k] = tuple(v) if isinstance(v, list) else v
        return MuZeroModel(**kwargs)

    def init_params(self, rng: jax.Array, batch_size: int = 1) -> MuZeroParams:
        if self.model_type == "mlp":
            obs = jnp.zeros((batch_size, int(self.observation_shape)), jnp.float32)
        else:
            obs = jnp.zeros((batch_size,) + tuple(self.observation_shape), jnp.float32)
        action = jnp.zeros((batch_size,), jnp.int32)
        return self.init(rng, obs, action)
