"""MuZero-RNN-full-obs policy (reference lzero/policy/muzero_rnn_full_obs.py
+ MuZeroRNNFullObsMCTSCtree, mcts_ctree.py:468-666): the GRU world-model
history rides the search embedding (like EfficientZero's LSTM state); the
unroll loss threads the same history."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from lightzero_tpu.config import Config
from lightzero_tpu.models.muzero_rnn import MuZeroRNNModel
from lightzero_tpu.ops import (
    cross_entropy_loss,
    inverse_scalar_transform,
    phi_transform,
    scalar_transform,
)
from lightzero_tpu.policy.muzero import MuZeroPolicy, TrainBatch, negative_cosine_similarity
from lightzero_tpu.search import RecurrentOutput
from lightzero_tpu.utils import POLICY_REGISTRY


@POLICY_REGISTRY.register("muzero_rnn_full_obs")
class MuZeroRNNFullObsPolicy(MuZeroPolicy):
    @staticmethod
    def default_config() -> Config:
        cfg = MuZeroPolicy.default_config()
        cfg.type = "muzero_rnn_full_obs"
        cfg.model.rnn_hidden_size = 128
        cfg.model.self_supervised_learning_loss = True
        cfg.ssl_loss_weight = 2.0
        return cfg

    def __init__(self, cfg: Config, model=None):
        if model is None:
            scale = cfg.model.get("support_scale", 300)
            model_cfg = Config(dict(cfg.model))
            model_cfg.value_support_size = int(2 * scale + 1)
            model_cfg.reward_support_size = int(2 * scale + 1)
            model = MuZeroRNNModel.from_config(model_cfg)
        super().__init__(cfg, model=model)

    def _initial(self, params, obs):
        out = self.model.apply(params, obs, method=MuZeroRNNModel.initial_inference)
        # base-class collect/reanalyze access fields attribute-style
        from types import SimpleNamespace

        return SimpleNamespace(**out)

    def _bootstrap_value_fn(self, target_params, obs):
        out = self._initial(target_params, obs)
        return inverse_scalar_transform(out.value_logits, self.value_support)

    def _root_embedding(self, out0):
        return dict(latent=out0.latent_state, history=out0.history)

    def _recurrent_fn(self, params, rng, action, emb) -> RecurrentOutput:
        out = self.model.apply(
            params, emb["latent"], emb["history"], action,
            method=MuZeroRNNModel.recurrent_inference,
        )
        return RecurrentOutput(
            reward=inverse_scalar_transform(out["reward_logits"], self.reward_support),
            value=inverse_scalar_transform(out["value_logits"], self.value_support),
            prior_logits=out["policy_logits"],
            embedding=dict(latent=out["latent_state"], history=out["history"]),
        )

    def _loss_fn(self, params, batch: TrainBatch):
        cfg = self.cfg
        K = self.num_unroll_steps
        M = MuZeroRNNModel
        tv_cat = phi_transform(self.value_support, scalar_transform(batch.target_value))
        tr_cat = phi_transform(self.reward_support, scalar_transform(batch.target_reward))

        out0 = self._initial(params, batch.obs[:, 0])
        value_loss = cross_entropy_loss(out0.value_logits, tv_cat[:, 0])
        policy_loss = cross_entropy_loss(out0.policy_logits, batch.target_policy[:, 0])
        prob = jax.nn.softmax(out0.policy_logits, axis=-1)
        entropy = -jnp.sum(prob * jnp.log(jnp.maximum(prob, 1e-9)), axis=-1)
        policy_entropy_loss = -entropy
        pred_value0 = inverse_scalar_transform(out0.value_logits, self.value_support)
        value_priority = jnp.abs(pred_value0 - batch.target_value[:, 0])

        latent, history = out0.latent_state, out0.history
        reward_loss = jnp.zeros_like(value_loss)
        consistency_loss = jnp.zeros_like(value_loss)
        ssl = cfg.ssl_loss_weight > 0

        for k in range(K):
            out = self.model.apply(
                params, latent, history, batch.actions[:, k], method=M.recurrent_inference
            )
            latent, history = out["latent_state"], out["history"]
            if ssl:
                repr_k = self.model.apply(params, batch.obs[:, k + 1], method=M.representation)
                proj_dyn = self.model.apply(params, latent, True, method=M.project)
                proj_obs = jax.lax.stop_gradient(
                    self.model.apply(
                        params, jax.lax.stop_gradient(repr_k), False, method=M.project
                    )
                )
                consistency_loss = consistency_loss + negative_cosine_similarity(
                    proj_dyn, proj_obs
                ) * batch.mask[:, k]
            policy_loss = policy_loss + cross_entropy_loss(
                out["policy_logits"], batch.target_policy[:, k + 1]
            )
            prob = jax.nn.softmax(out["policy_logits"], axis=-1)
            entropy = -jnp.sum(prob * jnp.log(jnp.maximum(prob, 1e-9)), axis=-1)
            policy_entropy_loss = policy_entropy_loss - entropy
            value_loss = value_loss + cross_entropy_loss(out["value_logits"], tv_cat[:, k + 1])
            reward_loss = reward_loss + cross_entropy_loss(out["reward_logits"], tr_cat[:, k])

        loss = (
            cfg.ssl_loss_weight * consistency_loss
            + cfg.policy_loss_weight * policy_loss
            + cfg.value_loss_weight * value_loss
            + cfg.reward_loss_weight * reward_loss
            + cfg.policy_entropy_weight * policy_entropy_loss
        )
        weighted_total_loss = jnp.mean(batch.weights * loss)
        logs = dict(
            total_loss=weighted_total_loss,
            policy_loss=jnp.mean(policy_loss),
            value_loss=jnp.mean(value_loss),
            reward_loss=jnp.mean(reward_loss),
            consistency_loss=jnp.mean(consistency_loss),
            policy_entropy=jnp.mean(entropy),
            predicted_value=jnp.mean(pred_value0),
            target_value=jnp.mean(batch.target_value[:, 0]),
        )
        return weighted_total_loss / K, (logs, value_priority)
