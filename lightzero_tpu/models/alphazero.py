"""AlphaZero model: policy + value net over board planes (flax).

Capability-parity rebuild of reference lzero/model/alphazero_model.py:
conv ResNet trunk + policy head (logits over actions) + value head
(tanh scalar); ``compute_policy_value`` / ``compute_logp_value`` equivalents
are plain applies of this module. NHWC layout.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lightzero_tpu.models.common import MLPTorso, ResBlock


class AlphaZeroModel(nn.Module):
    observation_shape: Tuple[int, int, int] = (3, 3, 3)  # H, W, C
    action_space_size: int = 9
    num_channels: int = 32
    num_res_blocks: int = 1
    value_head_hidden_channels: Sequence[int] = (32,)
    policy_head_hidden_channels: Sequence[int] = (32,)
    norm_type: str = "LN"

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """obs (B, H, W, C) → (policy_logits (B, A), value (B,) in [-1, 1])."""
        x = nn.Conv(self.num_channels, (3, 3), padding="SAME", use_bias=False)(obs)
        x = nn.LayerNorm()(x)
        x = nn.relu(x)
        for _ in range(self.num_res_blocks):
            x = ResBlock(self.num_channels, self.norm_type)(x)
        flat = x.reshape(x.shape[0], -1)
        policy_logits = MLPTorso(
            hidden_sizes=tuple(self.policy_head_hidden_channels),
            output_size=self.action_space_size,
            norm_type=self.norm_type,
            last_linear_layer_init_zero=True,
        )(flat)
        value = MLPTorso(
            hidden_sizes=tuple(self.value_head_hidden_channels),
            output_size=1,
            norm_type=self.norm_type,
            last_linear_layer_init_zero=True,
        )(flat)
        value = jnp.tanh(value[..., 0])
        return policy_logits, value

    def init_params(self, rng: jax.Array, batch_size: int = 1) -> Any:
        obs = jnp.zeros((batch_size,) + tuple(self.observation_shape), jnp.float32)
        return self.init(rng, obs)

    @staticmethod
    def from_config(model_cfg) -> "AlphaZeroModel":
        obs_shape = tuple(model_cfg.get("observation_shape", (3, 3, 3)))
        return AlphaZeroModel(
            observation_shape=obs_shape,
            action_space_size=model_cfg.get("action_space_size", 9),
            num_channels=model_cfg.get("num_channels", 32),
            num_res_blocks=model_cfg.get("num_res_blocks", 1),
            norm_type=model_cfg.get("norm_type", "LN"),
        )
