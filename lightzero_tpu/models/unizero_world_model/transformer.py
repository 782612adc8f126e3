"""Decoder-only transformer for the UniZero world model.

Capability-parity rebuild of reference
lzero/model/unizero_world_models/transformer.py (nanoGPT-style
Transformer/Block/SelfAttention :333,464,556 with explicit causal-mask
attention and KV-cache append :596-662) and kv_caching.py (preallocated
(B, heads, max_tokens, dim) tensors :94-290) — redesigned TPU-first:

- RoPE by default (the reference's ``rotary_emb`` flag): position comes
  from an absolute ``pos`` index per token, so a sliding context window
  never needs the reference's precomputed positional-embedding difference
  machinery (world_model.py:826-861);
- the KV cache is a fixed-shape ring buffer pytree carried through
  jit/scan (write index = pos % max_tokens), so per-simulation cache
  bookkeeping lives INSIDE the compiled search instead of python dict
  pools keyed by latent state (world_model.py:1758);
- attention is plain masked matmul on the MXU (T ≤ ~20 tokens; flash
  attention is unnecessary at this size, SURVEY.md §5.7).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    """(reference TransformerConfig, transformer.py:290)."""

    num_layers: int = 2
    num_heads: int = 8
    embed_dim: int = 256
    max_tokens: int = 32  # ring-buffer capacity (2 * max context steps)
    attn_dropout: float = 0.0
    resid_dropout: float = 0.0
    rope_base: float = 10000.0

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads


class KVCache(NamedTuple):
    """Fixed-shape ring-buffer cache: k/v (B, L, H, T, Dh), pos (B,) next
    absolute position, len (B,) valid entries (≤ T)."""

    k: jnp.ndarray
    v: jnp.ndarray
    pos: jnp.ndarray  # (B, T) absolute position of each slot (-1 = empty)
    next_pos: jnp.ndarray  # (B,) absolute position of the next token


def init_kv_cache(cfg: TransformerConfig, batch_size: int, dtype=jnp.float32) -> KVCache:
    B, L, H, T, Dh = batch_size, cfg.num_layers, cfg.num_heads, cfg.max_tokens, cfg.head_dim
    return KVCache(
        k=jnp.zeros((B, L, H, T, Dh), dtype),
        v=jnp.zeros((B, L, H, T, Dh), dtype),
        pos=jnp.full((B, T), -1, jnp.int32),
        next_pos=jnp.zeros((B,), jnp.int32),
    )


def _rope(x: jnp.ndarray, pos: jnp.ndarray, base: float) -> jnp.ndarray:
    """Rotary embedding. x: (..., T, Dh), pos: broadcastable (..., T)."""
    Dh = x.shape[-1]
    half = Dh // 2
    freqs = 1.0 / (base ** (jnp.arange(half, dtype=jnp.float32) / half))
    angles = pos[..., None].astype(jnp.float32) * freqs  # (..., T, half)
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1).astype(x.dtype)


class SelfAttention(nn.Module):
    cfg: TransformerConfig
    layer_idx: int

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, T, D)
        pos: jnp.ndarray,  # (B, T) absolute positions
        cache: Optional[KVCache] = None,
    ) -> Tuple[jnp.ndarray, Optional[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]]:
        cfg = self.cfg
        B, T, D = x.shape
        H, Dh = cfg.num_heads, cfg.head_dim
        qkv = nn.Dense(3 * D, use_bias=False)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)  # (B, H, T, Dh)

        q, k, v = heads(q), heads(k), heads(v)
        q = _rope(q, pos[:, None, :], cfg.rope_base)
        k = _rope(k, pos[:, None, :], cfg.rope_base)

        if cache is None:
            # full-sequence training forward: causal mask within the block
            att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(Dh)
            causal = pos[:, None, :, None] >= pos[:, None, None, :]  # (B,1,T,T)
            att = jnp.where(causal, att, -jnp.inf)
            att = jax.nn.softmax(att, axis=-1)
            y = jnp.einsum("bhqk,bhkd->bhqd", att, v)
            new_kv = None
        else:
            # incremental: attend over ring-buffer cache + current tokens
            ck = cache.k[:, self.layer_idx]  # (B, H, Tc, Dh)
            cv = cache.v[:, self.layer_idx]
            cpos = cache.pos  # (B, Tc)
            all_k = jnp.concatenate([ck, k], axis=2)
            all_v = jnp.concatenate([cv, v], axis=2)
            all_pos = jnp.concatenate([cpos, pos], axis=1)  # (B, Tc+T)
            att = jnp.einsum("bhqd,bhkd->bhqk", q, all_k) / jnp.sqrt(Dh)
            valid = all_pos[:, None, None, :] >= 0
            causal = pos[:, None, :, None] >= all_pos[:, None, None, :]
            att = jnp.where(valid & causal, att, -jnp.inf)
            att = jax.nn.softmax(att, axis=-1)
            y = jnp.einsum("bhqk,bhkd->bhqd", att, all_v)
            new_kv = (k, v, pos)
        y = y.transpose(0, 2, 1, 3).reshape(B, T, D)
        return nn.Dense(D, use_bias=False)(y), new_kv


class Block(nn.Module):
    cfg: TransformerConfig
    layer_idx: int

    @nn.compact
    def __call__(self, x, pos, cache=None):
        attn_out, new_kv = SelfAttention(self.cfg, self.layer_idx)(nn.LayerNorm()(x), pos, cache)
        x = x + attn_out
        h = nn.LayerNorm()(x)
        h = nn.Dense(4 * self.cfg.embed_dim)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.cfg.embed_dim)(h)
        return x + h, new_kv


class Transformer(nn.Module):
    cfg: TransformerConfig

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, pos: jnp.ndarray, cache: Optional[KVCache] = None
    ) -> Tuple[jnp.ndarray, Optional[KVCache]]:
        """x (B, T, D), pos (B, T) absolute token positions.

        With ``cache``: attends over cache + x, returns the cache with x's
        k/v written into the ring buffer.
        """
        new_ks, new_vs = [], []
        for i in range(self.cfg.num_layers):
            x, new_kv = Block(self.cfg, i)(x, pos, cache)
            if new_kv is not None:
                new_ks.append(new_kv[0])
                new_vs.append(new_kv[1])
        x = nn.LayerNorm()(x)
        if cache is None:
            return x, None
        # write the T new tokens into the ring buffer
        B, T = pos.shape
        Tc = cache.k.shape[3]
        slots = pos % Tc  # (B, T)
        bidx = jnp.arange(B)[:, None, None, None]
        lidx = jnp.arange(self.cfg.num_layers)[None, :, None, None]
        hidx = jnp.arange(self.cfg.num_heads)[None, None, :, None]
        sidx = slots[:, None, None, :]  # (B, 1, 1, T)
        nk = jnp.stack(new_ks, axis=1)  # (B, L, H, T, Dh)
        nv = jnp.stack(new_vs, axis=1)
        k = cache.k.at[bidx, lidx, hidx, sidx].set(nk)
        v = cache.v.at[bidx, lidx, hidx, sidx].set(nv)
        cpos = cache.pos.at[jnp.arange(B)[:, None], slots].set(pos)
        next_pos = pos[:, -1] + 1
        return x, KVCache(k=k, v=v, pos=cpos, next_pos=next_pos)
