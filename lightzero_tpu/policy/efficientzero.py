"""EfficientZero policy.

Capability-parity rebuild of reference lzero/policy/efficientzero.py:
- value_prefix CE against h-transformed within-horizon reward prefix sums
  (:304-341), LSTM reward-hidden state reset every ``lstm_horizon_len``
  unroll/search steps;
- SSL consistency loss (mandatory for EZ);
- search carries (latent, c, h, vp_accum, depth) as the embedding pytree —
  the reference's per-node value_prefix/is_reset bookkeeping
  (ptree_ez.py:106-113,566-600; mcts_ctree.py:773-774,853-861) reduces to
  reward = vp − vp_accum with vp_accum/(c,h) zeroed at horizon boundaries,
  computed inside the jitted recurrent_fn, so the generic pUCT kernel is
  reused unchanged.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from lightzero_tpu.config import Config
from lightzero_tpu.models.efficientzero import EfficientZeroModel
from lightzero_tpu.ops import (
    cross_entropy_loss,
    inverse_scalar_transform,
    phi_transform,
    scalar_transform,
)
from lightzero_tpu.policy.muzero import MuZeroPolicy, TrainBatch, negative_cosine_similarity
from lightzero_tpu.search import RecurrentOutput, RootOutput
from lightzero_tpu.utils import POLICY_REGISTRY


@POLICY_REGISTRY.register("efficientzero")
class EfficientZeroPolicy(MuZeroPolicy):
    @staticmethod
    def default_config() -> Config:
        cfg = MuZeroPolicy.default_config()
        cfg.type = "efficientzero"
        cfg.lstm_horizon_len = 5
        cfg.model.lstm_hidden_size = 512
        cfg.model.self_supervised_learning_loss = True
        cfg.ssl_loss_weight = 2.0
        return cfg

    def __init__(self, cfg: Config, model=None):
        self.lstm_horizon_len = int(cfg.get("lstm_horizon_len", 5))
        if model is None:
            scale = cfg.model.get("support_scale", 300)
            model_cfg = Config(dict(cfg.model))
            model_cfg.value_support_size = int(2 * scale + 1)
            model_cfg.reward_support_size = int(2 * scale + 1)
            model = EfficientZeroModel.from_config(model_cfg)
        super().__init__(cfg, model=model)

    # ------------------------------------------------------------ inference
    def _initial(self, params, obs):
        return self.model.apply(params, obs, method=EfficientZeroModel.initial_inference)

    def _root_embedding(self, out0):
        B = out0.latent_state.shape[0]
        c, h = out0.reward_hidden
        return dict(
            latent=out0.latent_state,
            c=c,
            h=h,
            vp_accum=jnp.zeros((B,), jnp.float32),
            depth=jnp.zeros((B,), jnp.int32),
        )

    def _recurrent_fn(self, params, rng, action, emb) -> RecurrentOutput:
        out = self.model.apply(
            params,
            emb["latent"],
            (emb["c"], emb["h"]),
            action,
            method=EfficientZeroModel.recurrent_inference,
        )
        vp = inverse_scalar_transform(out.value_prefix_logits, self.reward_support)
        value = inverse_scalar_transform(out.value_logits, self.value_support)
        reward = vp - emb["vp_accum"]
        depth = emb["depth"] + 1
        # horizon reset (mcts_ctree.py:853-861: search_len % horizon == 0)
        reset = (depth % self.lstm_horizon_len) == 0
        c, h = out.reward_hidden
        rm = reset[:, None].astype(c.dtype)
        new_emb = dict(
            latent=out.latent_state,
            c=c * (1.0 - rm),
            h=h * (1.0 - rm),
            vp_accum=jnp.where(reset, 0.0, vp),
            depth=depth,
        )
        return RecurrentOutput(
            reward=reward,
            value=value,
            prior_logits=out.policy_logits,
            embedding=new_emb,
        )

    # _forward_collect / _forward_reanalyze inherited: the base builds the
    # root via self._root_embedding, which carries the LSTM state here.

    # ---------------------------------------------------------------- learn
    def _loss_fn(self, params, batch: TrainBatch):
        cfg = self.cfg
        K = self.num_unroll_steps
        tv_cat = phi_transform(self.value_support, scalar_transform(batch.target_value))

        out0 = self._initial(params, batch.obs[:, 0])
        value_loss = cross_entropy_loss(out0.value_logits, tv_cat[:, 0])
        policy_loss = cross_entropy_loss(out0.policy_logits, batch.target_policy[:, 0])
        prob = jax.nn.softmax(out0.policy_logits, axis=-1)
        entropy = -jnp.sum(prob * jnp.log(jnp.maximum(prob, 1e-9)), axis=-1)
        policy_entropy_loss = -entropy
        pred_value0 = inverse_scalar_transform(out0.value_logits, self.value_support)
        value_priority = jnp.abs(pred_value0 - batch.target_value[:, 0])

        latent = out0.latent_state
        reward_hidden = out0.reward_hidden
        B = latent.shape[0]
        vp_target = jnp.zeros((B,), jnp.float32)
        prefix_loss = jnp.zeros_like(value_loss)
        consistency_loss = jnp.zeros_like(value_loss)
        ssl = cfg.ssl_loss_weight > 0

        for k in range(K):
            out = self.model.apply(
                params,
                latent,
                reward_hidden,
                batch.actions[:, k],
                method=EfficientZeroModel.recurrent_inference,
            )
            latent = out.latent_state
            reward_hidden = out.reward_hidden
            if ssl:
                repr_k = self.model.apply(
                    params, batch.obs[:, k + 1], method=EfficientZeroModel.representation
                )
                proj_dyn = self.model.apply(params, latent, True, method=EfficientZeroModel.project)
                proj_obs = jax.lax.stop_gradient(
                    self.model.apply(
                        params,
                        jax.lax.stop_gradient(repr_k),
                        False,
                        method=EfficientZeroModel.project,
                    )
                )
                consistency_loss = consistency_loss + negative_cosine_similarity(
                    proj_dyn, proj_obs
                ) * batch.mask[:, k]
            policy_loss = policy_loss + cross_entropy_loss(
                out.policy_logits, batch.target_policy[:, k + 1]
            )
            prob = jax.nn.softmax(out.policy_logits, axis=-1)
            entropy = -jnp.sum(prob * jnp.log(jnp.maximum(prob, 1e-9)), axis=-1)
            policy_entropy_loss = policy_entropy_loss - entropy
            value_loss = value_loss + cross_entropy_loss(out.value_logits, tv_cat[:, k + 1])
            # value_prefix target: within-horizon reward prefix sum
            vp_target = vp_target + batch.target_reward[:, k]
            vp_cat = phi_transform(self.reward_support, scalar_transform(vp_target))
            prefix_loss = prefix_loss + cross_entropy_loss(out.value_prefix_logits, vp_cat)
            if (k + 1) % self.lstm_horizon_len == 0:
                # horizon reset (efficientzero.py learn loop)
                z = jnp.zeros_like(reward_hidden[0])
                reward_hidden = (z, z)
                vp_target = jnp.zeros_like(vp_target)

        loss = (
            cfg.ssl_loss_weight * consistency_loss
            + cfg.policy_loss_weight * policy_loss
            + cfg.value_loss_weight * value_loss
            + cfg.reward_loss_weight * prefix_loss
            + cfg.policy_entropy_weight * policy_entropy_loss
        )
        weighted_total_loss = jnp.mean(batch.weights * loss)
        scaled_loss = weighted_total_loss / K
        logs = dict(
            total_loss=weighted_total_loss,
            policy_loss=jnp.mean(policy_loss),
            value_loss=jnp.mean(value_loss),
            value_prefix_loss=jnp.mean(prefix_loss),
            consistency_loss=jnp.mean(consistency_loss),
            policy_entropy=jnp.mean(entropy),
            predicted_value=jnp.mean(pred_value0),
            target_value=jnp.mean(batch.target_value[:, 0]),
        )
        return scaled_loss, (logs, value_priority)

    def _bootstrap_value_fn(self, target_params, obs):
        out = self._initial(target_params, obs)
        return inverse_scalar_transform(out.value_logits, self.value_support)
