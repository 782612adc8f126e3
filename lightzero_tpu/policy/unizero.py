"""UniZero policy.

Capability-parity rebuild of reference lzero/policy/unizero.py:
- learn = world-model sequence loss (obs-embedding prediction + reward CE +
  value CE + policy CE, unizero.py:~800-1300 / world_model.compute_loss
  :1852) over (obs, action, reward, value, policy) sequence batches — the
  standard TrainBatch IS the sequence batch (K = context steps);
- collect keeps a per-env rolling KV cache across real steps (the
  reference's last_batch_obs/last_batch_action context, unizero.py:1342-
  1350), exposed to the collector via the stateful-collect API;
- the search carries a PER-NODE copy of the KV cache in the embedding:
  one search step appends [action token, predicted-obs token]
  (forward_recurrent_inference, world_model.py:1420-1504), all inside the
  fused jitted search.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from lightzero_tpu.config import Config
from lightzero_tpu.models.unizero import UniZeroModel
from lightzero_tpu.ops import (
    cross_entropy_loss,
    inverse_scalar_transform,
    phi_transform,
    scalar_transform,
)
from lightzero_tpu.ops.action import sample_from_visit_counts
from lightzero_tpu.policy.muzero import MuZeroPolicy, TrainBatch
from lightzero_tpu.search import (
    RecurrentOutput,
    RootOutput,
    batch_puct_search,
)
from lightzero_tpu.utils import POLICY_REGISTRY


@POLICY_REGISTRY.register("unizero")
class UniZeroPolicy(MuZeroPolicy):
    stateful_collect = True

    @staticmethod
    def default_config() -> Config:
        cfg = MuZeroPolicy.default_config()
        cfg.type = "unizero"
        cfg.num_unroll_steps = 10  # sequence/context length in steps
        cfg.model.embed_dim = 256
        cfg.model.num_layers = 2
        cfg.model.num_heads = 8
        cfg.model.max_tokens = 32
        cfg.obs_loss_weight = 10.0
        cfg.target_update_freq = 100
        return cfg

    def __init__(self, cfg: Config, model=None):
        if model is None:
            scale = cfg.model.get("support_scale", 300)
            model_cfg = Config(dict(cfg.model))
            model_cfg.value_support_size = int(2 * scale + 1)
            model_cfg.reward_support_size = int(2 * scale + 1)
            model = UniZeroModel.from_config(model_cfg)
        super().__init__(cfg, model=model)

    # ---------------------------------------------------- stateful collect
    def _fresh_cache(self, batch_size: int):
        from lightzero_tpu.models.unizero_world_model.transformer import (
            TransformerConfig,
            init_kv_cache,
        )

        tcfg = TransformerConfig(
            num_layers=self.model.num_layers,
            num_heads=self.model.num_heads,
            embed_dim=self.model.embed_dim,
            max_tokens=self.model.max_tokens,
        )
        return init_kv_cache(tcfg, batch_size)

    def init_collect_state(self, batch_size: int):
        """Rolling per-env KV cache (reset at episode boundaries)."""
        return self._fresh_cache(batch_size)

    def reset_collect_state(self, state, done):
        """Zero the cache rows of done envs."""
        fresh = jax.tree_util.tree_map(jnp.zeros_like, state)
        fresh = fresh._replace(pos=jnp.full_like(state.pos, -1))

        def sel(a, b):
            extra = (1,) * (a.ndim - 1)
            return jnp.where(done.reshape(-1, *extra), a, b)

        return jax.tree_util.tree_map(sel, fresh, state)

    # ------------------------------------------------------------ inference
    def _recurrent_fn(self, params, rng, action, emb) -> RecurrentOutput:
        cache = emb["cache"]
        a_out, cache = self.model.apply(
            params, cache, action, method=UniZeroModel.infer_action_step
        )
        o_out, cache = self.model.apply(
            params, cache, a_out["obs_pred"], method=UniZeroModel.infer_obs_step
        )
        return RecurrentOutput(
            reward=inverse_scalar_transform(a_out["reward_logits"], self.reward_support),
            value=inverse_scalar_transform(o_out["value_logits"], self.value_support),
            prior_logits=o_out["policy_logits"],
            embedding=dict(cache=cache),
        )

    def _forward_collect_stateful(
        self,
        params,
        rng,
        obs,
        legal_mask,
        to_play,
        temperature,
        epsilon,
        collect_state,
        deterministic: bool = False,
    ):
        obs_e = self.model.apply(params, obs, method=UniZeroModel.encode_obs)
        o_out, cache = self.model.apply(
            params, collect_state, obs_e, method=UniZeroModel.infer_obs_step
        )
        pred_value = inverse_scalar_transform(o_out["value_logits"], self.value_support)
        root = RootOutput(
            prior_logits=o_out["policy_logits"],
            value=pred_value,
            embedding=dict(cache=cache),
        )
        rng, s_rng, a_rng, e_rng, u_rng = jax.random.split(rng, 5)
        search_out = batch_puct_search(
            params,
            s_rng,
            root,
            self._recurrent_fn,
            self.search_cfg,
            legal_mask,
            to_play=to_play,
            with_noise=not deterministic,
        )
        actions, dist_entropy = sample_from_visit_counts(
            a_rng, search_out.visit_counts, temperature, deterministic=deterministic
        )
        B, A = legal_mask.shape
        rand_action = jax.random.categorical(u_rng, jnp.where(legal_mask, 0.0, -jnp.inf), axis=-1)
        explore = jax.random.uniform(e_rng, (B,)) < epsilon
        actions = jnp.where(explore & ~jnp.asarray(deterministic), rand_action, actions)
        # advance the TRUE context with the chosen action token only (the
        # real next obs arrives at the next env step)
        _, new_state = self.model.apply(
            params, cache, actions, method=UniZeroModel.infer_action_step
        )
        out = dict(
            action=actions,
            visit_counts=search_out.visit_counts,
            searched_value=search_out.root_value,
            predicted_value=pred_value,
            policy_logits=o_out["policy_logits"],
            distribution_entropy=dist_entropy,
        )
        return out, new_state

    # ---------------------------------------------------------------- learn
    def _loss_fn(self, params, batch: TrainBatch):
        cfg = self.cfg
        K = self.num_unroll_steps
        tv_cat = phi_transform(self.value_support, scalar_transform(batch.target_value))
        tr_cat = phi_transform(self.reward_support, scalar_transform(batch.target_reward))

        out = self.model.apply(
            params, batch.obs, batch.actions, method=UniZeroModel.train_forward
        )
        # value/policy at every obs position 0..K
        value_loss = cross_entropy_loss(out["value_logits"], tv_cat).sum(-1)
        policy_loss = cross_entropy_loss(out["policy_logits"], batch.target_policy).sum(-1)
        reward_loss = cross_entropy_loss(out["reward_logits"], tr_cat).sum(-1)
        # next-obs embedding prediction (masked beyond trajectory)
        target_e = jax.lax.stop_gradient(out["obs_embeddings"][:, 1:])  # (B, K, D)
        obs_loss = jnp.sum(
            jnp.mean((out["obs_pred"] - target_e) ** 2, axis=-1) * batch.mask, axis=-1
        )
        prob = jax.nn.softmax(out["policy_logits"][:, 0], axis=-1)
        entropy = -jnp.sum(prob * jnp.log(jnp.maximum(prob, 1e-9)), axis=-1)
        pred_value0 = inverse_scalar_transform(out["value_logits"][:, 0], self.value_support)
        value_priority = jnp.abs(pred_value0 - batch.target_value[:, 0])

        loss = (
            cfg.policy_loss_weight * policy_loss
            + cfg.value_loss_weight * value_loss
            + cfg.reward_loss_weight * reward_loss
            + cfg.obs_loss_weight * obs_loss
            + cfg.policy_entropy_weight * (-entropy)
        )
        weighted_total_loss = jnp.mean(batch.weights * loss)
        scaled_loss = weighted_total_loss / K
        logs = dict(
            total_loss=weighted_total_loss,
            policy_loss=jnp.mean(policy_loss),
            value_loss=jnp.mean(value_loss),
            reward_loss=jnp.mean(reward_loss),
            obs_loss=jnp.mean(obs_loss),
            policy_entropy=jnp.mean(entropy),
            predicted_value=jnp.mean(pred_value0),
            target_value=jnp.mean(batch.target_value[:, 0]),
        )
        return scaled_loss, (logs, value_priority)

    def _bootstrap_value_fn(self, target_params, obs):
        """Single-obs value: fresh cache + one obs token."""
        B = obs.shape[0]
        cache = self._fresh_cache(B)
        obs_e = self.model.apply(target_params, obs, method=UniZeroModel.encode_obs)
        o_out, _ = self.model.apply(
            target_params, cache, obs_e, method=UniZeroModel.infer_obs_step
        )
        return inverse_scalar_transform(o_out["value_logits"], self.value_support)

    def _forward_reanalyze(self, target_params, rng, obs, legal_mask, to_play):
        """Reanalyze from a fresh single-obs context (the reference's
        UniZero buffer threads batch_action context; fresh-context targets
        are the simpler TPU-side equivalent)."""
        B = obs.shape[0]
        cache = self._fresh_cache(B)
        obs_e = self.model.apply(target_params, obs, method=UniZeroModel.encode_obs)
        o_out, cache = self.model.apply(
            target_params, cache, obs_e, method=UniZeroModel.infer_obs_step
        )
        root = RootOutput(
            prior_logits=o_out["policy_logits"],
            value=inverse_scalar_transform(o_out["value_logits"], self.value_support),
            embedding=dict(cache=cache),
        )
        search_out = batch_puct_search(
            target_params,
            rng,
            root,
            self._recurrent_fn,
            self.search_cfg,
            legal_mask,
            to_play=to_play,
            with_noise=bool(self.cfg.get("reanalyze_noise", True)),
        )
        counts = search_out.visit_counts.astype(jnp.float32)
        return counts / jnp.maximum(counts.sum(-1, keepdims=True), 1e-9), search_out.root_value
