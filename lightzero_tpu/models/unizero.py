"""UniZero model (flax): tokenizer + transformer world model.

Capability-parity rebuild of reference lzero/model/unizero_model.py +
unizero_world_models/world_model.py: interleaved (obs, action) token
sequence — 2 tokens per env step (atari_unizero_config.py:61) — with heads
sliced per token position (slicer.py): value/policy read at obs-token
positions, reward/next-obs-embedding at action-token positions
(compute_loss, world_model.py:1852-2481). The reference's per-env
python-dict KV-cache pools keyed by latent state
(retrieve_or_generate_kvcache :1758, trim_and_pad :1506, update_cache
:1559, pos-emb-diff :826) are replaced by the fixed-shape RoPE ring-buffer
cache in transformer.py, carried through jit — including per-node copies
inside the fused search.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lightzero_tpu.models.common import MLPTorso, RepresentationNetworkConv, SimNorm
from lightzero_tpu.models.unizero_world_model.transformer import (
    KVCache,
    Transformer,
    TransformerConfig,
    init_kv_cache,
)


class UniZeroModel(nn.Module):
    observation_shape: Any = 4
    action_space_size: int = 2  # number of actions, or action DIM if continuous
    continuous_action: bool = False  # Sampled UniZero (continuous actions)
    obs_type: str = "vector"  # 'vector' | 'image'
    embed_dim: int = 256
    num_layers: int = 2
    num_heads: int = 8
    max_tokens: int = 32  # ring-buffer capacity = 2 * context steps
    # sliding inference-attention window in TOKENS (reference
    # context_length = 2 * infer_context_length); 0 = full ring visible
    context_window: int = 0
    value_support_size: int = 601
    reward_support_size: int = 601
    norm_type: str = "LN"
    last_linear_layer_init_zero: bool = True
    simnorm_dim: int = 8
    # Final norm on obs embeddings / predicted next embeddings (reference
    # final_norm_option_in_encoder, sampled_unizero.py:124-133): 'SimNorm'
    # (discrete simplex latents — pair with group_kl obs loss) or
    # 'LayerNorm' (continuous latents — pair with MSE; the reference's
    # continuous-control default). SimNorm+MSE quantizes away small
    # action effects — root cause of the flat sampled-unizero pendulum
    # runs (round 4).
    latent_norm: str = "SimNorm"
    # conv encoder (image obs)
    num_channels: int = 64
    downsample: bool = True
    # tokenizer decoder for the latent reconstruction loss (tokenizer.py:283)
    with_decoder: bool = False
    # image encoder family: 'conv' (ResNet) or 'vit' (reference vit.py)
    encoder_type: str = "conv"
    # sparse-MoE feed-forward in the world-model transformer (moe.py)
    moe_in_transformer: bool = False
    num_experts: int = 4
    num_experts_per_tok: int = 1
    # multitask task-embedding conditioning (world_model_multitask.py)
    num_tasks: int = 0
    # CurriculumLoRA (transformer.py:70-219); stage is static per instance
    lora_r: int = 0
    curriculum_stage_num: int = 1
    curriculum_stage: int = 0

    def setup(self):
        D = self.embed_dim
        self.tcfg = TransformerConfig(
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            embed_dim=D,
            max_tokens=self.max_tokens,
            context_window=self.context_window,
            moe_in_transformer=self.moe_in_transformer,
            num_experts=self.num_experts,
            num_experts_per_tok=self.num_experts_per_tok,
            num_tasks=self.num_tasks,
            lora_r=self.lora_r,
            curriculum_stage_num=self.curriculum_stage_num,
            curriculum_stage=self.curriculum_stage,
        )
        if self.obs_type == "vector":
            self._enc = MLPTorso(
                hidden_sizes=(D,),
                output_size=D,
                norm_type=self.norm_type,
                output_norm=True,
            )
        elif self.encoder_type == "vit":
            from lightzero_tpu.models.vit import ViT

            self._enc_vit = ViT(out_dim=D)
        else:
            self._enc_conv = RepresentationNetworkConv(
                num_channels=self.num_channels, downsample=self.downsample, norm_type=self.norm_type
            )
            self._enc_proj = nn.Dense(D)
        if self.latent_norm == "SimNorm":
            self._simnorm = SimNorm(self.simnorm_dim)
        else:
            self._simnorm = nn.LayerNorm()
        if self.continuous_action:
            self._act_embed_dense = nn.Dense(D)
        else:
            self._act_embed = nn.Embed(self.action_space_size, D)
        if self.continuous_action:
            # Gaussian policy heads (Sampled UniZero,
            # lzero/model/sampled_unizero_model.py)
            # zero-init (see sampled_muzero.py: prevents init-policy lock-in)
            self._mu_head = MLPTorso(hidden_sizes=(D,), output_size=self.action_space_size,
                                     norm_type=self.norm_type,
                                     last_linear_layer_init_zero=True)
            self._sigma_head = MLPTorso(hidden_sizes=(D,), output_size=self.action_space_size,
                                        norm_type=self.norm_type,
                                        last_linear_layer_init_zero=True)
        self._wm = Transformer(self.tcfg)
        head = lambda out: MLPTorso(
            hidden_sizes=(D,),
            output_size=out,
            norm_type=self.norm_type,
            last_linear_layer_init_zero=self.last_linear_layer_init_zero,
        )
        self._value_head = head(self.value_support_size)
        self._policy_head = head(self.action_space_size)  # logits (discrete)
        self._reward_head = head(self.reward_support_size)
        self._obs_head = MLPTorso(
            hidden_sizes=(D,), output_size=D, norm_type=self.norm_type
        )
        # tokenizer decoder (reference Tokenizer.decode_to_obs /
        # decode_to_reconstruction_outputs, tokenizer.py:283-301): maps a
        # latent embedding back to observation space for the latent
        # reconstruction loss
        if self.with_decoder:
            if self.obs_type == "vector":
                self._dec = MLPTorso(
                    hidden_sizes=(D,),
                    output_size=int(self.observation_shape),
                    norm_type=self.norm_type,
                )
            else:
                h, w, c = self.observation_shape  # NHWC like the encoder
                f = 8 if self.downsample else 1
                self._dec_proj = nn.Dense((h // f) * (w // f) * self.num_channels)
                self._dec_convs = [
                    nn.ConvTranspose(self.num_channels, (3, 3), strides=(2, 2))
                    for _ in range(3 if self.downsample else 0)
                ]
                self._dec_out = nn.Conv(c, (3, 3))
        # adaptive policy-entropy temperature (reference unizero.py:1036-1100:
        # log_alpha learned against a decaying target entropy)
        self.log_alpha = self.param("log_alpha", nn.initializers.zeros, ())

    def embed_action(self, action):
        if self.continuous_action:
            return self._act_embed_dense(action.astype(jnp.float32))
        return self._act_embed(action)

    def policy_params(self, h):
        """Continuous policy head: (mu, sigma) with bounded mean, sigma in
        [0.1, 2.0] so the zero-init head starts at sigma ~ 1.05 — matching
        the reference's exp(log_sigma) head (sigma = 1 at zero-init) and the
        sampled_muzero fix: a 1.0-capped sigmoid (init 0.55) reproduces the
        one-sided tanh-saturation lock-in root-caused in round 2."""
        mu = 1.5 * jnp.tanh(self._mu_head(h))
        sigma = 0.1 + 1.9 * jax.nn.sigmoid(self._sigma_head(h))
        return mu, sigma

    # ------------------------------------------------------------ tokenizer
    def encode_obs(self, obs: jnp.ndarray) -> jnp.ndarray:
        """(B, *obs) → (B, D) SimNorm'd embedding (reference Tokenizer
        encode_to_obs_embeddings, tokenizer.py:66; SimNorm common.py:145)."""
        if self.obs_type == "vector":
            e = self._enc(obs)
        elif self.encoder_type == "vit":
            e = self._enc_vit(obs)
        else:
            e = self._enc_conv(obs)
            e = self._enc_proj(e.reshape(e.shape[0], -1))
        return self._simnorm(e)

    def decode_obs(self, emb: jnp.ndarray) -> jnp.ndarray:
        """(B, D) embedding → reconstructed observation, NHWC for images
        (tokenizer.py:283)."""
        if self.obs_type == "vector":
            return self._dec(emb)
        h, w, c = self.observation_shape
        f = 8 if self.downsample else 1
        x = self._dec_proj(emb).reshape(emb.shape[0], h // f, w // f, self.num_channels)
        for conv in self._dec_convs:
            x = nn.relu(conv(x))
        x = self._dec_out(x)
        # crop to the exact size (ConvTranspose may overshoot)
        return x[:, :h, :w, :]

    # ------------------------------------------------------- train forward
    def train_forward(self, obs_seq: jnp.ndarray, actions: jnp.ndarray, task_id=None):
        """obs_seq (B, K+1, *obs), actions (B, K) →
        dict of per-step head outputs (value/policy at obs positions 0..K,
        reward/obs_pred at action positions 0..K-1) + the target obs
        embeddings."""
        obs_e = jax.vmap(self.encode_obs, in_axes=1, out_axes=1)(obs_seq)  # (B, K+1, D)
        return self.train_forward_embedded(obs_e, actions, task_id)

    def train_forward_embedded(self, obs_e: jnp.ndarray, actions: jnp.ndarray, task_id=None):
        """train_forward on PRE-EMBEDDED obs tokens (B, K+1, D) — lets the
        drift-correction loss re-run the sequence with the model's own
        predicted embeddings substituted for the real ones (the tokens the
        search actually rolls over, policy/unizero.py:_recurrent_fn)."""
        B, K1 = obs_e.shape[:2]
        K = K1 - 1
        act_e = self.embed_action(actions)  # (B, K, D)
        # interleave [o_0, a_0, o_1, a_1, ..., o_K] -> 2K+1 tokens
        D = obs_e.shape[-1]
        tokens = jnp.zeros((B, 2 * K + 1, D), obs_e.dtype)
        tokens = tokens.at[:, 0::2].set(obs_e)
        tokens = tokens.at[:, 1::2].set(act_e)
        pos = jnp.broadcast_to(jnp.arange(2 * K + 1), (B, 2 * K + 1))
        x, _ = self._wm(tokens, pos, None, task_id)
        obs_positions = x[:, 0::2]  # (B, K+1, D)
        act_positions = x[:, 1::2]  # (B, K, D)
        out = dict(
            value_logits=self._value_head(obs_positions),  # (B, K+1, S)
            policy_logits=self._policy_head(obs_positions),  # (B, K+1, A)
            reward_logits=self._reward_head(act_positions),  # (B, K, S)
            obs_pred=self._simnorm(self._obs_head(act_positions)),  # (B, K, D)
            obs_embeddings=obs_e,  # (B, K+1, D)
        )
        if self.continuous_action:
            mu, sigma = self.policy_params(obs_positions)
            out["mu"], out["sigma"] = mu, sigma
        return out

    # --------------------------------------------------------- infer steps
    def infer_obs_step(self, cache: KVCache, obs_embedding: jnp.ndarray, task_id=None):
        """Append the obs token; heads at it → (value, policy). Equivalent
        of forward_initial_inference (world_model.py:1394)."""
        x = obs_embedding[:, None, :]
        pos = cache.next_pos[:, None]
        out, cache = self._wm(x, pos, cache, task_id)
        h = out[:, 0]
        res = dict(
            value_logits=self._value_head(h),
            policy_logits=self._policy_head(h),
            latent=h,
        )
        if self.continuous_action:
            res["mu"], res["sigma"] = self.policy_params(h)
        return res, cache

    def infer_action_step(self, cache: KVCache, action: jnp.ndarray, task_id=None):
        """Append the action token; heads at it → (reward, predicted next
        obs embedding). Equivalent of forward_recurrent_inference's first
        half (world_model.py:1420)."""
        x = self.embed_action(action)[:, None, :]
        pos = cache.next_pos[:, None]
        out, cache = self._wm(x, pos, cache, task_id)
        h = out[:, 0]
        return dict(
            reward_logits=self._reward_head(h),
            obs_pred=self._simnorm(self._obs_head(h)),
        ), cache

    def init_cache(self, batch_size: int) -> KVCache:
        return init_kv_cache(self.tcfg, batch_size)

    def prefill(self, obs_seq: jnp.ndarray, actions: jnp.ndarray, length: jnp.ndarray, task_id=None):
        """Teacher-force a (obs, action) history into a fresh KV cache and
        return the root head outputs at the FINAL obs token — the
        context-threaded reanalyze root (the reference threads batch_action
        through per-env caches, game_buffer_unizero.py:400,544).

        obs_seq (B, H+1, *obs), actions (B, H); ``length`` (B,) = number of
        valid history steps per row (0 ≤ length ≤ H): rows with shorter
        histories mask out their earliest tokens via position -1 slots.
        """
        B, H1 = obs_seq.shape[:2]
        H = H1 - 1
        obs_e = jax.vmap(self.encode_obs, in_axes=1, out_axes=1)(obs_seq)
        act_e = self.embed_action(actions)
        D = obs_e.shape[-1]
        T = 2 * H + 1
        tokens = jnp.zeros((B, T, D), obs_e.dtype)
        tokens = tokens.at[:, 0::2].set(obs_e)
        tokens = tokens.at[:, 1::2].set(act_e)
        pos = jnp.broadcast_to(jnp.arange(T), (B, T)).astype(jnp.int32)
        # shift so histories of different lengths all END at the same token:
        # row with length l uses tokens [2(H-l) .. 2H]; earlier slots get
        # pos=-1 which the attention mask treats as empty
        start = 2 * (H - length)[:, None]
        pos = jnp.where(pos >= start, pos - start, -1)
        cache = self.init_cache(B)
        x, cache = self._wm(tokens, pos, cache, task_id)
        h = x[:, -1]
        res = dict(
            value_logits=self._value_head(h),
            policy_logits=self._policy_head(h),
            latent=h,
        )
        if self.continuous_action:
            res["mu"], res["sigma"] = self.policy_params(h)
        return res, cache

    def __call__(self, obs_seq, actions):
        out = self.train_forward(obs_seq, actions)
        cache = self.init_cache(obs_seq.shape[0])
        o, cache = self.infer_obs_step(cache, out["obs_embeddings"][:, 0])
        a, cache = self.infer_action_step(cache, actions[:, 0])
        if self.with_decoder:
            # touch the decoder so init() creates its parameters
            _ = self.decode_obs(out["obs_embeddings"][:, 0])
        return out

    def init_params(self, rng: jax.Array, batch_size: int = 1, K: int = 2):
        if self.obs_type == "vector":
            obs = jnp.zeros((batch_size, K + 1, int(self.observation_shape)), jnp.float32)
        else:
            obs = jnp.zeros((batch_size, K + 1) + tuple(self.observation_shape), jnp.float32)
        if self.continuous_action:
            act = jnp.zeros((batch_size, K, self.action_space_size), jnp.float32)
        else:
            act = jnp.zeros((batch_size, K), jnp.int32)
        return self.init(rng, obs, act)

    @staticmethod
    def from_config(model_cfg) -> "UniZeroModel":
        obs_shape = model_cfg.get("observation_shape", 4)
        if isinstance(obs_shape, (list, tuple)):
            obs_shape = tuple(obs_shape)
            obs_type = "image"
        else:
            obs_type = "vector"
        wm = model_cfg.get("world_model_cfg", {})
        kwargs = dict(
            observation_shape=obs_shape,
            action_space_size=model_cfg.get("action_space_size", 2),
            continuous_action=model_cfg.get("continuous_action_space", False),
            obs_type=model_cfg.get("obs_type", obs_type),
            embed_dim=wm.get("embed_dim", model_cfg.get("embed_dim", 256)),
            num_layers=wm.get("num_layers", model_cfg.get("num_layers", 2)),
            num_heads=wm.get("num_heads", model_cfg.get("num_heads", 8)),
            max_tokens=wm.get("max_tokens", model_cfg.get("max_tokens", 32)),
            context_window=int(
                wm.get("context_length", model_cfg.get("context_window", 0))
            ),
            norm_type=model_cfg.get("norm_type", "LN"),
            num_channels=model_cfg.get("num_channels", 64),
            downsample=model_cfg.get("downsample", True),
            with_decoder=bool(model_cfg.get("with_decoder", False)),
            encoder_type=model_cfg.get("encoder_type", wm.get("encoder_type", "conv")),
            moe_in_transformer=bool(wm.get("moe_in_transformer", model_cfg.get("moe_in_transformer", False))),
            num_experts=int(wm.get("num_experts", model_cfg.get("num_experts", 4))),
            num_experts_per_tok=int(wm.get("num_experts_per_tok", model_cfg.get("num_experts_per_tok", 1))),
            latent_norm=str(
                wm.get("final_norm_option_in_encoder",
                       model_cfg.get("final_norm_option_in_encoder",
                                     model_cfg.get("latent_norm", "SimNorm")))
            ),
            num_tasks=int(wm.get("num_tasks", model_cfg.get("num_tasks", 0))),
            lora_r=int(wm.get("lora_r", model_cfg.get("lora_r", 0))),
            curriculum_stage_num=int(wm.get("curriculum_stage_num", model_cfg.get("curriculum_stage_num", 1))),
            curriculum_stage=int(wm.get("curriculum_stage", model_cfg.get("curriculum_stage", 0))),
        )
        for k in ("value_support_size", "reward_support_size"):
            if k in model_cfg:
                kwargs[k] = model_cfg[k]
        return UniZeroModel(**kwargs)
