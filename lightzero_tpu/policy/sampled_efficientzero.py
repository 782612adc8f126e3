"""Sampled EfficientZero policy (the reference's headline continuous-control
algorithm, lzero/policy/sampled_efficientzero.py).

Composition of the two machineries already golden-tested separately:
- SampledMuZero's K tanh-Gaussian sampled actions with density priors
  (_calculate_policy_loss_cont, sampled_efficientzero.py:589);
- EfficientZero's LSTM value-prefix with horizon reset folded into the
  search embedding (reward = vp − vp_accum).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from lightzero_tpu.config import Config
from lightzero_tpu.models.sampled_efficientzero import SampledEfficientZeroModel
from lightzero_tpu.ops import (
    cross_entropy_loss,
    inverse_scalar_transform,
    phi_transform,
    scalar_transform,
)
from lightzero_tpu.policy.muzero import negative_cosine_similarity
from lightzero_tpu.policy.sampled_muzero import (
    SampledMuZeroPolicy,
    gaussian_tanh_logp,
    sampled_search_prior,
)
from lightzero_tpu.search import RecurrentOutput
from lightzero_tpu.utils import POLICY_REGISTRY


@POLICY_REGISTRY.register("sampled_efficientzero")
class SampledEfficientZeroPolicy(SampledMuZeroPolicy):
    @staticmethod
    def default_config() -> Config:
        cfg = SampledMuZeroPolicy.default_config()
        cfg.type = "sampled_efficientzero"
        cfg.lstm_horizon_len = 5
        cfg.model.lstm_hidden_size = 256
        return cfg

    def __init__(self, cfg: Config, model=None):
        self.lstm_horizon_len = int(cfg.get("lstm_horizon_len", 5))
        if model is None:
            scale = cfg.model.get("support_scale", 300)
            model_cfg = Config(dict(cfg.model))
            model_cfg.value_support_size = int(2 * scale + 1)
            model_cfg.reward_support_size = int(2 * scale + 1)
            model = SampledEfficientZeroModel.from_config(model_cfg)
        super().__init__(cfg, model=model)

    # ------------------------------------------------------------ inference
    def _initial(self, params, obs):
        return self.model.apply(params, obs, method=SampledEfficientZeroModel.initial_inference)

    def _recurrent_fn(self, params, rng, slot, emb) -> RecurrentOutput:
        B = emb["latent"].shape[0]
        bidx = jnp.arange(B)
        action = emb["sampled_actions"][bidx, slot]  # (B, D) cont / (B,) int
        out = self.model.apply(
            params,
            emb["latent"],
            (emb["c"], emb["h"]),
            action,
            method=SampledEfficientZeroModel.recurrent_inference,
        )
        vp = inverse_scalar_transform(out["value_prefix_logits"], self.reward_support)
        reward = vp - emb["vp_accum"]
        depth = emb["depth"] + 1
        reset = (depth % self.lstm_horizon_len) == 0
        c, h = out["reward_hidden"]
        rm = reset[:, None].astype(c.dtype)
        new_actions, logp = self._sample_candidates(rng, out)
        return RecurrentOutput(
            reward=reward,
            value=inverse_scalar_transform(out["value_logits"], self.value_support),
            prior_logits=sampled_search_prior(self.cfg, logp),
            embedding=dict(
                latent=out["latent_state"],
                sampled_actions=new_actions,
                c=c * (1.0 - rm),
                h=h * (1.0 - rm),
                vp_accum=jnp.where(reset, 0.0, vp),
                depth=depth,
            ),
        )

    def _forward_collect(
        self, params, rng, obs, legal_mask, to_play, temperature, epsilon, deterministic=False
    ):
        from lightzero_tpu.ops.action import sample_from_visit_counts
        from lightzero_tpu.search import RootOutput, batch_puct_search

        out0 = self._initial(params, obs)
        B = obs.shape[0]
        rng, r_rng, s_rng, a_rng = jax.random.split(rng, 4)
        root_actions, root_logp = self._sample_candidates(
            r_rng, out0, legal_mask=legal_mask if self.discrete else None
        )
        pred_value = inverse_scalar_transform(out0["value_logits"], self.value_support)
        c, h = out0["reward_hidden"]
        root = RootOutput(
            prior_logits=sampled_search_prior(self.cfg, root_logp),
            value=pred_value,
            embedding=dict(
                latent=out0["latent_state"],
                sampled_actions=root_actions,
                c=c,
                h=h,
                vp_accum=jnp.zeros((B,), jnp.float32),
                depth=jnp.zeros((B,), jnp.int32),
            ),
        )
        search_out = batch_puct_search(
            params,
            s_rng,
            root,
            self._recurrent_fn,
            self.search_cfg,
            jnp.ones((B, self.K), bool),
            to_play=to_play,
            with_noise=not deterministic,
        )
        slot, dist_entropy = sample_from_visit_counts(
            a_rng, search_out.visit_counts, temperature, deterministic=deterministic
        )
        action = root_actions[jnp.arange(B), slot]
        return dict(
            action=action,
            chosen_slot=slot,
            visit_counts=search_out.visit_counts,
            root_sampled_actions=root_actions,
            searched_value=search_out.root_value,
            predicted_value=pred_value,
            distribution_entropy=dist_entropy,
        )

    # ---------------------------------------------------------------- learn
    def _loss_fn(self, params, batch):
        base = batch.base
        sampled = batch.sampled_actions
        cfg = self.cfg
        K = self.num_unroll_steps
        M = SampledEfficientZeroModel
        tv_cat = phi_transform(self.value_support, scalar_transform(base.target_value))

        out0 = self._initial(params, base.obs[:, 0])

        normalize = bool(cfg.get("normalize_prob_of_sampled_actions", False))

        def policy_loss_at(out, k):
            if self.discrete:
                # reference _calculate_policy_loss_disc
                # (sampled_efficientzero.py:697): CE between normalized root
                # visits over the K sampled actions and the categorical head
                logits = out["policy_logits"]
                acts = sampled[:, k].astype(jnp.int32)
                if acts.ndim == 3:
                    acts = acts[..., 0]
                logp_all = jax.nn.log_softmax(logits, axis=-1)
                logp = jnp.take_along_axis(logp_all, acts, axis=-1)
                prob = jax.nn.softmax(logits, axis=-1)
                ent = -jnp.sum(prob * logp_all, axis=-1)
            else:
                mu, sigma = out["mu"], out["sigma"]
                logp = gaussian_tanh_logp(sampled[:, k], mu[:, None, :], sigma[:, None, :])
                ent = jnp.sum(0.5 * jnp.log(2 * jnp.pi * jnp.e * sigma**2), axis=-1)
            if normalize:
                # normalize densities over the K candidates with a DETACHED
                # denominator (reference normalize_prob_of_sampled_actions,
                # sampled_efficientzero.py:673-679) — removes the incentive
                # to inflate absolute density (sigma collapse)
                logp = logp - jax.lax.stop_gradient(
                    jax.scipy.special.logsumexp(logp, axis=-1, keepdims=True)
                )
            loss = -jnp.sum(base.target_policy[:, k] * logp, axis=-1)
            return loss, ent

        value_loss = cross_entropy_loss(out0["value_logits"], tv_cat[:, 0])
        policy_loss, entropy = policy_loss_at(out0, 0)
        policy_entropy_loss = -entropy
        pred_value0 = inverse_scalar_transform(out0["value_logits"], self.value_support)
        value_priority = jnp.abs(pred_value0 - base.target_value[:, 0])

        latent = out0["latent_state"]
        reward_hidden = out0["reward_hidden"]
        B = latent.shape[0]
        vp_target = jnp.zeros((B,), jnp.float32)
        prefix_loss = jnp.zeros_like(value_loss)
        consistency_loss = jnp.zeros_like(value_loss)
        ssl = cfg.ssl_loss_weight > 0

        for k in range(K):
            out = self.model.apply(
                params, latent, reward_hidden, base.actions[:, k], method=M.recurrent_inference
            )
            latent = out["latent_state"]
            reward_hidden = out["reward_hidden"]
            if ssl:
                repr_k = self.model.apply(params, base.obs[:, k + 1], method=M.representation)
                proj_dyn = self.model.apply(params, latent, True, method=M.project)
                proj_obs = jax.lax.stop_gradient(
                    self.model.apply(
                        params, jax.lax.stop_gradient(repr_k), False, method=M.project
                    )
                )
                consistency_loss = consistency_loss + negative_cosine_similarity(
                    proj_dyn, proj_obs
                ) * base.mask[:, k]
            pl, ent = policy_loss_at(out, k + 1)
            policy_loss = policy_loss + pl
            policy_entropy_loss = policy_entropy_loss - ent
            value_loss = value_loss + cross_entropy_loss(out["value_logits"], tv_cat[:, k + 1])
            vp_target = vp_target + base.target_reward[:, k]
            vp_cat = phi_transform(self.reward_support, scalar_transform(vp_target))
            prefix_loss = prefix_loss + cross_entropy_loss(out["value_prefix_logits"], vp_cat)
            if (k + 1) % self.lstm_horizon_len == 0:
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
        weighted_total_loss = jnp.mean(base.weights * loss)
        scaled_loss = weighted_total_loss / K
        logs = dict(
            total_loss=weighted_total_loss,
            policy_loss=jnp.mean(policy_loss),
            value_loss=jnp.mean(value_loss),
            value_prefix_loss=jnp.mean(prefix_loss),
            consistency_loss=jnp.mean(consistency_loss),
            policy_entropy=jnp.mean(entropy),
            predicted_value=jnp.mean(pred_value0),
            target_value=jnp.mean(base.target_value[:, 0]),
        )
        return scaled_loss, (logs, value_priority)

    def _bootstrap_value_fn(self, target_params, obs):
        out = self._initial(target_params, obs)
        return inverse_scalar_transform(out["value_logits"], self.value_support)
