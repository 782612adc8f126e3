"""Stochastic MuZero policy.

Capability-parity rebuild of reference lzero/policy/stochastic_muzero.py:
- search alternates decision/afterstate nodes: decision children selected by
  pUCT, chance children SAMPLED from the predicted chance distribution
  (via SearchConfig.stochastic / Tree.is_chance);
- learn loss (:365-496): policy/value/reward CE + afterstate value CE +
  afterstate chance CE (vs the straight-through chance-encoder code or the
  true env chance label when ``use_ture_chance_label_in_chance_encoder``)
  + encoder commitment MSE.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from lightzero_tpu.config import Config
from lightzero_tpu.models.stochastic_muzero import StochasticMuZeroModel
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
    SearchConfig,
    batch_puct_search,
)
from lightzero_tpu.utils import POLICY_REGISTRY


@POLICY_REGISTRY.register("stochastic_muzero")
class StochasticMuZeroPolicy(MuZeroPolicy):
    @staticmethod
    def default_config() -> Config:
        cfg = MuZeroPolicy.default_config()
        cfg.type = "stochastic_muzero"
        cfg.model.chance_space_size = 32
        cfg.use_ture_chance_label_in_chance_encoder = True
        cfg.afterstate_policy_loss_weight = 1.0
        cfg.afterstate_value_loss_weight = 0.25
        cfg.commitment_loss_weight = 1.0
        return cfg

    def __init__(self, cfg: Config, model=None):
        self.chance_space = int(cfg.model.get("chance_space_size", 32))
        if model is None:
            scale = cfg.model.get("support_scale", 300)
            model_cfg = Config(dict(cfg.model))
            model_cfg.value_support_size = int(2 * scale + 1)
            model_cfg.reward_support_size = int(2 * scale + 1)
            model = StochasticMuZeroModel.from_config(model_cfg)
        super().__init__(cfg, model=model)
        self.action_space = int(cfg.model.action_space_size)
        # tree width = max(action space, chance space)
        self.tree_width = max(self.action_space, self.chance_space)
        self.search_cfg = SearchConfig(
            num_simulations=cfg.num_simulations,
            pb_c_base=float(cfg.pb_c_base),
            pb_c_init=float(cfg.pb_c_init),
            discount=float(cfg.discount_factor),
            value_delta_max=float(cfg.value_delta_max),
            root_dirichlet_alpha=float(cfg.root_dirichlet_alpha),
            root_noise_weight=float(cfg.root_noise_weight),
            players=1,
            stochastic=True,
        )

    # ------------------------------------------------------------ inference
    def _flat(self, obs):
        return obs.reshape(obs.shape[0], -1)

    def _initial(self, params, obs):
        return self.model.apply(
            params, self._flat(obs), method=StochasticMuZeroModel.initial_inference
        )

    def _root_embedding(self, out0):
        B = out0.latent_state.shape[0]
        return dict(latent=out0.latent_state, is_chance=jnp.zeros((B,), bool))

    def _pad_width(self, x, fill):
        """(B, A_or_C) → (B, tree_width)."""
        pad = self.tree_width - x.shape[-1]
        if pad == 0:
            return x
        return jnp.pad(x, ((0, 0), (0, pad)), constant_values=fill)

    def _recurrent_fn(self, params, rng, action, emb) -> RecurrentOutput:
        latent = emb["latent"]
        parent_is_chance = emb["is_chance"]
        B = latent.shape[0]
        # decision parent → afterstate leaf (chance node)
        as_out = self.model.apply(
            params,
            latent,
            jnp.minimum(action, self.action_space - 1),
            False,
            method=StochasticMuZeroModel.recurrent_inference,
        )
        # chance parent → decision leaf
        dec_out = self.model.apply(
            params,
            latent,
            jnp.minimum(action, self.chance_space - 1),
            True,
            method=StochasticMuZeroModel.recurrent_inference,
        )
        pc = parent_is_chance
        pick = lambda a, b: jnp.where(pc.reshape((B,) + (1,) * (a.ndim - 1)), a, b)
        value_logits = pick(dec_out.value_logits, as_out.value_logits)
        reward_logits = pick(dec_out.reward_logits, as_out.reward_logits)
        new_latent = pick(dec_out.latent_state, as_out.latent_state)
        prior_logits = pick(
            self._pad_width(dec_out.policy_logits, -1e9),
            self._pad_width(as_out.policy_logits, -1e9),
        )
        a_legal = jnp.arange(self.tree_width) < self.action_space
        c_legal = jnp.arange(self.tree_width) < self.chance_space
        legal = jnp.where(pc[:, None], jnp.broadcast_to(a_legal, (B, self.tree_width)),
                          jnp.broadcast_to(c_legal, (B, self.tree_width)))
        return RecurrentOutput(
            reward=inverse_scalar_transform(reward_logits, self.reward_support),
            value=inverse_scalar_transform(value_logits, self.value_support),
            prior_logits=prior_logits,
            embedding=dict(latent=new_latent, is_chance=~pc),
            legal_mask=legal,
            is_chance=~pc,
        )

    def _forward_collect(
        self, params, rng, obs, legal_mask, to_play, temperature, epsilon, deterministic=False
    ):
        out0 = self._initial(params, obs)
        pred_value = inverse_scalar_transform(out0.value_logits, self.value_support)
        root = RootOutput(
            prior_logits=self._pad_width(out0.policy_logits, -1e9),
            value=pred_value,
            embedding=self._root_embedding(out0),
        )
        wide_legal = self._pad_width(legal_mask, False)
        rng, s_rng, a_rng, e_rng, u_rng = jax.random.split(rng, 5)
        search_out = batch_puct_search(
            params,
            s_rng,
            root,
            self._recurrent_fn,
            self.search_cfg,
            wide_legal,
            to_play=to_play,
            with_noise=not deterministic,
        )
        counts = search_out.visit_counts[:, : self.action_space]
        actions, dist_entropy = sample_from_visit_counts(
            a_rng, counts, temperature, deterministic=deterministic
        )
        B, A = legal_mask.shape
        rand_action = jax.random.categorical(u_rng, jnp.where(legal_mask, 0.0, -jnp.inf), axis=-1)
        explore = jax.random.uniform(e_rng, (B,)) < epsilon
        actions = jnp.where(explore & ~jnp.asarray(deterministic), rand_action, actions)
        return dict(
            action=actions,
            visit_counts=counts,
            searched_value=search_out.root_value,
            predicted_value=pred_value,
            policy_logits=out0.policy_logits,
            distribution_entropy=dist_entropy,
        )

    # ---------------------------------------------------------------- learn
    def _loss_fn(self, params, batch: TrainBatch):
        cfg = self.cfg
        K = self.num_unroll_steps
        M = StochasticMuZeroModel
        use_true = bool(cfg.get("use_ture_chance_label_in_chance_encoder", True))
        tv_cat = phi_transform(self.value_support, scalar_transform(batch.target_value))
        tr_cat = phi_transform(self.reward_support, scalar_transform(batch.target_reward))

        out0 = self._initial(params, batch.obs[:, 0])
        value_loss = cross_entropy_loss(out0.value_logits, tv_cat[:, 0])
        policy_loss = cross_entropy_loss(out0.policy_logits, batch.target_policy[:, 0, : self.action_space])
        prob = jax.nn.softmax(out0.policy_logits, axis=-1)
        entropy = -jnp.sum(prob * jnp.log(jnp.maximum(prob, 1e-9)), axis=-1)
        policy_entropy_loss = -entropy
        pred_value0 = inverse_scalar_transform(out0.value_logits, self.value_support)
        value_priority = jnp.abs(pred_value0 - batch.target_value[:, 0])

        latent = out0.latent_state
        zeros = jnp.zeros_like(value_loss)
        reward_loss = zeros
        afterstate_policy_loss = zeros
        afterstate_value_loss = zeros
        commitment_loss = zeros

        for k in range(K):
            # decision step → afterstate
            as_out = self.model.apply(
                params, latent, batch.actions[:, k], False, method=M.recurrent_inference
            )
            # chance code from consecutive obs (or true env label)
            obs_pair = jnp.concatenate(
                [self._flat(batch.obs[:, k]), self._flat(batch.obs[:, k + 1])], axis=-1
            )
            enc_logits, enc_onehot = self.model.apply(
                params, obs_pair, method=M.chance_encode
            )
            if use_true and batch.chance is not None:
                chance_code = batch.chance[:, k]
                chance_onehot = jax.nn.one_hot(chance_code, self.chance_space, dtype=enc_logits.dtype)
                commitment_loss = commitment_loss + jnp.mean(
                    (enc_logits - jax.lax.stop_gradient(chance_onehot)) ** 2, axis=-1
                )
            else:
                chance_code = jnp.argmax(enc_logits, axis=-1)
                chance_onehot = enc_onehot
                commitment_loss = commitment_loss + jnp.mean(
                    (enc_logits - jax.nn.one_hot(chance_code, self.chance_space, enc_logits.dtype)) ** 2,
                    axis=-1,
                )
            # chance step → next latent
            dec_out = self.model.apply(
                params, as_out.latent_state, chance_code, True, method=M.recurrent_inference
            )
            latent = dec_out.latent_state

            afterstate_policy_loss = afterstate_policy_loss + cross_entropy_loss(
                as_out.policy_logits, jax.lax.stop_gradient(chance_onehot)
            )
            afterstate_value_loss = afterstate_value_loss + cross_entropy_loss(
                as_out.value_logits, tv_cat[:, k]
            )
            value_loss = value_loss + cross_entropy_loss(dec_out.value_logits, tv_cat[:, k + 1])
            reward_loss = reward_loss + cross_entropy_loss(dec_out.reward_logits, tr_cat[:, k])
            policy_loss = policy_loss + cross_entropy_loss(
                dec_out.policy_logits, batch.target_policy[:, k + 1, : self.action_space]
            )
            prob = jax.nn.softmax(dec_out.policy_logits, axis=-1)
            entropy = -jnp.sum(prob * jnp.log(jnp.maximum(prob, 1e-9)), axis=-1)
            policy_entropy_loss = policy_entropy_loss - entropy

        loss = (
            cfg.policy_loss_weight * policy_loss
            + cfg.value_loss_weight * value_loss
            + cfg.reward_loss_weight * reward_loss
            + cfg.afterstate_policy_loss_weight * afterstate_policy_loss
            + cfg.afterstate_value_loss_weight * afterstate_value_loss
            + cfg.commitment_loss_weight * commitment_loss
            + cfg.policy_entropy_weight * policy_entropy_loss
        )
        weighted_total_loss = jnp.mean(batch.weights * loss)
        scaled_loss = weighted_total_loss / K
        logs = dict(
            total_loss=weighted_total_loss,
            policy_loss=jnp.mean(policy_loss),
            value_loss=jnp.mean(value_loss),
            reward_loss=jnp.mean(reward_loss),
            afterstate_policy_loss=jnp.mean(afterstate_policy_loss),
            afterstate_value_loss=jnp.mean(afterstate_value_loss),
            commitment_loss=jnp.mean(commitment_loss),
            policy_entropy=jnp.mean(entropy),
            predicted_value=jnp.mean(pred_value0),
            target_value=jnp.mean(batch.target_value[:, 0]),
        )
        return scaled_loss, (logs, value_priority)

    def _bootstrap_value_fn(self, target_params, obs):
        out = self._initial(target_params, obs)
        return inverse_scalar_transform(out.value_logits, self.value_support)
