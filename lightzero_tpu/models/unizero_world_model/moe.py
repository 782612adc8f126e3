"""Mixture-of-Experts feed-forward for the UniZero transformer.

Capability-parity rebuild of reference
lzero/model/unizero_world_models/moe.py (Mistral-style sparse MoE:
MultiplicationFeedForward SwiGLU experts :20, MoELayer with
num_experts/top-k gate routing :69-160) — redesigned TPU-first: instead of
gather/scatter token dispatch (great for CPU/GPU sparse kernels, terrible
for XLA), every expert runs densely and the top-k-masked softmax gate
combines them:  out = Σ_e w_e(x) · FF_e(x).  Mathematically identical to
the reference's routed computation; for the small expert counts UniZero
uses (≤ 8) the dense form is faster on the MXU than dynamic dispatch.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class SwiGLUFeedForward(nn.Module):
    """FFN_SwiGLU(x) = (SiLU(x·W1) ⊙ (x·W3))·W2 (reference moe.py:20-57)."""

    embed_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = 4 * self.embed_dim
        w1 = nn.Dense(hidden, use_bias=False)(x)
        w3 = nn.Dense(hidden, use_bias=False)(x)
        return nn.Dense(self.embed_dim, use_bias=False)(nn.silu(w1) * w3)


class MoELayer(nn.Module):
    """Top-k gated mixture of SwiGLU experts (reference moe.py:69-160)."""

    embed_dim: int
    num_experts: int = 4
    num_experts_per_tok: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # gate: (..., E) logits over experts
        gate_logits = nn.Dense(self.num_experts, use_bias=False, name="gate")(x)
        # top-k mask: keep the k largest logits per token, softmax over them
        k = min(self.num_experts_per_tok, self.num_experts)
        kth = jnp.sort(gate_logits, axis=-1)[..., -k][..., None]
        masked = jnp.where(gate_logits >= kth, gate_logits, -jnp.inf)
        weights = jax.nn.softmax(masked, axis=-1)  # (..., E)
        # dense dispatch: every expert on every token, gate-combined
        outs = jnp.stack(
            [
                SwiGLUFeedForward(self.embed_dim, name=f"expert_{e}")(x)
                for e in range(self.num_experts)
            ],
            axis=-1,
        )  # (..., D, E)
        return jnp.einsum("...de,...e->...d", outs, weights)
