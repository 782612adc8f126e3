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
    # sliding attention window for INCREMENTAL inference, in tokens
    # (reference context_length = 2 * infer_context_length,
    # atari_unizero_config.py:61 — the reference trains on max_tokens-wide
    # causal attention but trims the collect/eval/search context to this
    # many recent tokens). 0 = no limit beyond the ring capacity.
    context_window: int = 0
    # sparse mixture-of-experts feed-forward (reference moe flags in
    # TransformerConfig, transformer.py:290 + moe.py)
    moe_in_transformer: bool = False
    num_experts: int = 4
    num_experts_per_tok: int = 1
    # task-conditioning for multitask training (reference task_embed /
    # register-token options, transformer.py:70-219): a learned per-task
    # embedding added to every token
    num_tasks: int = 0
    # CurriculumLoRA (reference CurriculumLoRALinear, transformer.py:70-219):
    # W_eff = α₀·W₀ + Σ_{j≤stage} αⱼ·Δθⱼ with per-stage adapters; the stage
    # is STATIC (changing it re-specializes the jit — it changes a handful
    # of times per run). lora_r = 0 disables.
    lora_r: int = 0
    curriculum_stage_num: int = 1
    curriculum_stage: int = 0
    lora_alpha: float = 1.0
    lora_scale_init: float = 1.0

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


class CurriculumLoRADense(nn.Module):
    """Dense layer with curriculum-staged LoRA adapters (reference
    CurriculumLoRALinear, transformer.py:70-219 + LearnableScale :27):

        W_eff = α₀·W₀ + Σ_{j=1..stage} αⱼ·(A_j B_j)·(lora_alpha/r)

    with αᵢ = init + 0.2·tanh(logitᵢ). All adapters are computed and masked
    by (j ≤ stage) so the parameter structure is stage-independent; the
    trainability schedule (stage 0: base only; stage s: adapter_s +
    base_scale + earlier adapter scales) is enforced by the optimizer mask
    (curriculum_trainable_mask below), mirroring the reference's
    requires_grad toggles."""

    features: int
    cfg: TransformerConfig
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        base = nn.Dense(self.features, use_bias=self.use_bias, name="base")(x)
        s_logit = self.param("base_scale", nn.initializers.zeros, ())
        y = (1.0 + 0.2 * jnp.tanh(s_logit)) * base
        r = cfg.lora_r
        scaling = cfg.lora_alpha / max(r, 1)
        for j in range(1, cfg.curriculum_stage_num):
            A = self.param(f"lora_A_{j}", nn.initializers.normal(0.01), (x.shape[-1], r))
            B = self.param(f"lora_B_{j}", nn.initializers.zeros, (r, self.features))
            a_logit = self.param(f"adapter_scale_{j}", nn.initializers.zeros, ())
            alpha_j = cfg.lora_scale_init + 0.2 * jnp.tanh(a_logit)
            active = 1.0 if j <= cfg.curriculum_stage else 0.0
            y = y + active * alpha_j * ((x @ A) @ B) * scaling
        return y


def _dense(cfg: TransformerConfig, features: int, name: str, use_bias: bool = False):
    """nn.Dense, or its curriculum-LoRA wrapper when enabled."""
    if cfg.lora_r > 0 and cfg.curriculum_stage_num > 1:
        return CurriculumLoRADense(features, cfg, use_bias=use_bias, name=name)
    return nn.Dense(features, use_bias=use_bias, name=name)


def curriculum_trainable_mask(params, stage: int):
    """Pytree of bools: which params train at this curriculum stage
    (reference set_curriculum_stage, transformer.py:129-219 — stage 0 trains
    the base; stage s trains adapter_s, base_scale, and earlier adapter
    scales; the transformer base freezes)."""
    import re

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        names = [str(p) for p in path]
        is_lora_leaf = any(
            re.match(r"(lora_A_|lora_B_|adapter_scale_)\d+", n) or n == "base_scale"
            for n in names
        )
        if stage == 0:
            return not is_lora_leaf
        # stage >= 1
        for n in names:
            m = re.match(r"lora_[AB]_(\d+)", n)
            if m:
                return int(m.group(1)) == stage
            m = re.match(r"adapter_scale_(\d+)", n)
            if m:
                return int(m.group(1)) < stage
            if n == "base_scale":
                return True
        # non-LoRA leaves: freeze the transformer backbone, keep everything
        # outside the world-model transformer (encoder/heads) trainable
        if any(n in ("_wm", "Transformer_0") or n.startswith("Block") for n in names):
            return False
        return True

    return walk(params, ())


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
        qkv = _dense(cfg, 3 * D, "qkv")(x)
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
            # attention-map capture for analysis (reference
            # unizero_world_models/attention_map.py): retrieve with
            # model.apply(..., mutable=['intermediates'])
            self.sow("intermediates", "attention", att)
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
            keep = valid & causal
            if cfg.context_window > 0:
                # sliding window: only the last context_window tokens are
                # visible (reference trim_and_pad to context_length,
                # world_model.py:1506)
                recent = all_pos[:, None, None, :] > (
                    pos[:, None, :, None] - cfg.context_window
                )
                keep = keep & recent
            att = jnp.where(keep, att, -jnp.inf)
            att = jax.nn.softmax(att, axis=-1)
            y = jnp.einsum("bhqk,bhkd->bhqd", att, all_v)
            new_kv = (k, v, pos)
        y = y.transpose(0, 2, 1, 3).reshape(B, T, D)
        return _dense(cfg, D, "out_proj")(y), new_kv


class Block(nn.Module):
    cfg: TransformerConfig
    layer_idx: int

    @nn.compact
    def __call__(self, x, pos, cache=None):
        attn_out, new_kv = SelfAttention(self.cfg, self.layer_idx)(nn.LayerNorm()(x), pos, cache)
        x = x + attn_out
        h = nn.LayerNorm()(x)
        if self.cfg.moe_in_transformer:
            from lightzero_tpu.models.unizero_world_model.moe import MoELayer

            h = MoELayer(
                self.cfg.embed_dim,
                num_experts=self.cfg.num_experts,
                num_experts_per_tok=self.cfg.num_experts_per_tok,
            )(h)
        else:
            h = _dense(self.cfg, 4 * self.cfg.embed_dim, "ff_up", use_bias=True)(h)
            h = nn.gelu(h)
            h = _dense(self.cfg, self.cfg.embed_dim, "ff_down", use_bias=True)(h)
        return x + h, new_kv


class Transformer(nn.Module):
    cfg: TransformerConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        pos: jnp.ndarray,
        cache: Optional[KVCache] = None,
        task_id: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Optional[KVCache]]:
        """x (B, T, D), pos (B, T) absolute token positions.

        With ``cache``: attends over cache + x, returns the cache with x's
        k/v written into the ring buffer. With ``num_tasks > 0`` a learned
        per-task embedding conditions every token (the TPU-shaped
        equivalent of the reference's task-embedding / register-token
        options, world_model_multitask.py + transformer.py:70-219).
        """
        if self.cfg.num_tasks > 0:
            tid = (
                jnp.zeros((x.shape[0],), jnp.int32) if task_id is None else task_id.astype(jnp.int32)
            )
            task_e = nn.Embed(self.cfg.num_tasks, self.cfg.embed_dim, name="task_embed")(tid)
            x = x + task_e[:, None, :]
        new_ks, new_vs = [], []
        for i in range(self.cfg.num_layers):
            x, new_kv = Block(self.cfg, i)(x, pos, cache)
            if new_kv is not None:
                new_ks.append(new_kv[0])
                new_vs.append(new_kv[1])
        x = nn.LayerNorm()(x)
        if cache is None:
            return x, None
        # write the T new tokens into the ring buffer; tokens with pos < 0
        # (masked-out prefill history) route to slot Tc, which is out of
        # bounds so the scatter drops them (JAX default OOB-drop semantics)
        B, T = pos.shape
        Tc = cache.k.shape[3]
        slots = jnp.where(pos >= 0, pos % Tc, Tc)  # (B, T)
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
