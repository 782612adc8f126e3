"""Sampled UniZero policy (reference lzero/policy/sampled_unizero.py):
the transformer world model with K tanh-Gaussian sampled actions per node.

Composition of the UniZero KV-cache search with the sampled-continuous
machinery: the search embedding carries (per-node KV cache, K sampled
action vectors); the policy loss is the visit-weighted Gaussian density CE
over the stored root samples.
"""
from __future__ import annotations

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
from lightzero_tpu.policy.sampled_muzero import (
    SampledTrainBatch,
    gaussian_tanh_logp,
    gaussian_tanh_sample,
    sample_discrete_actions,
    sampled_search_prior,
)
from lightzero_tpu.policy.unizero import UniZeroPolicy, predict_latent_loss
from lightzero_tpu.search import RecurrentOutput, RootOutput, batch_puct_search
from lightzero_tpu.utils import POLICY_REGISTRY


@POLICY_REGISTRY.register("sampled_unizero")
class SampledUniZeroPolicy(UniZeroPolicy):
    @staticmethod
    def default_config() -> Config:
        cfg = UniZeroPolicy.default_config()
        cfg.type = "sampled_unizero"
        cfg.num_of_sampled_actions = 20
        cfg.normalize_prob_of_sampled_actions = True
        cfg.model.continuous_action_space = True
        cfg.policy_entropy_weight = 5e-3
        return cfg

    def __init__(self, cfg: Config, model=None):
        self.K = int(cfg.get("num_of_sampled_actions", 20))
        # discrete sampled UniZero (reference sampled_unizero.py
        # continuous_action_space=False branch: K candidates drawn without
        # replacement from the categorical head, CE-over-sampled loss)
        self.discrete = not bool(cfg.model.get("continuous_action_space", True))
        super().__init__(cfg, model=model)
        assert self.model.continuous_action != self.discrete

    def _sample_candidates(self, rng, out, legal_mask=None):
        """K candidate actions + prior log-weights from a head-output dict."""
        if self.discrete:
            return sample_discrete_actions(
                rng, out["policy_logits"], self.K, legal_mask=legal_mask
            )
        return gaussian_tanh_sample(rng, out["mu"], out["sigma"], self.K)

    # ------------------------------------------------------------ inference
    def _recurrent_fn(self, params, rng, slot, emb) -> RecurrentOutput:
        B = emb["sampled_actions"].shape[0]
        bidx = jnp.arange(B)
        action_vec = emb["sampled_actions"][bidx, slot]
        cache = emb["cache"]
        tid = self._task_ids(B)
        a_out, cache = self.model.apply(
            params, cache, action_vec, tid, method=UniZeroModel.infer_action_step
        )
        o_out, cache = self.model.apply(
            params, cache, a_out["obs_pred"], tid, method=UniZeroModel.infer_obs_step
        )
        new_actions, logp = self._sample_candidates(rng, o_out)
        return RecurrentOutput(
            reward=inverse_scalar_transform(a_out["reward_logits"], self.reward_support),
            value=inverse_scalar_transform(o_out["value_logits"], self.value_support),
            prior_logits=sampled_search_prior(self.cfg, logp),
            embedding=dict(cache=cache, sampled_actions=new_actions),
        )

    def _forward_collect_stateful(
        self, params, rng, obs, legal_mask, to_play, temperature, epsilon,
        collect_state, deterministic: bool = False,
    ):
        obs_e = self.model.apply(params, obs, method=UniZeroModel.encode_obs)
        o_out, cache = self.model.apply(
            params, collect_state, obs_e, self._task_ids(obs.shape[0]),
            method=UniZeroModel.infer_obs_step,
        )
        pred_value = inverse_scalar_transform(o_out["value_logits"], self.value_support)
        rng, r_rng, s_rng, a_rng = jax.random.split(rng, 4)
        root_actions, root_logp = self._sample_candidates(
            r_rng, o_out, legal_mask=legal_mask if self.discrete else None
        )
        root = RootOutput(
            prior_logits=sampled_search_prior(self.cfg, root_logp),
            value=pred_value,
            embedding=dict(cache=cache, sampled_actions=root_actions),
        )
        B = obs.shape[0]
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
        # advance the TRUE context with the chosen action token
        _, new_state = self.model.apply(
            params, cache, action, self._task_ids(B),
            method=UniZeroModel.infer_action_step,
        )
        out = dict(
            action=action,
            chosen_slot=slot,
            visit_counts=search_out.visit_counts,
            root_sampled_actions=root_actions,
            searched_value=search_out.root_value,
            predicted_value=pred_value,
            distribution_entropy=dist_entropy,
        )
        return out, new_state

    # ---------------------------------------------------------------- learn
    def _sample_losses(self, params, batch, task_id=None, train_iter=None):
        """Per-sample loss vector before IS weighting (see MuZeroPolicy.
        _sample_losses); ``batch`` is a SampledTrainBatch."""
        base = batch.base
        sampled = batch.sampled_actions  # (B, K+1, Ks, D)
        cfg = self.cfg
        K = self.num_unroll_steps
        tv_cat = phi_transform(self.value_support, scalar_transform(base.target_value))
        tr_cat = phi_transform(self.reward_support, scalar_transform(base.target_reward))

        out = self.model.apply(
            params, base.obs, base.actions, task_id, method=UniZeroModel.train_forward
        )
        value_loss = cross_entropy_loss(out["value_logits"], tv_cat).sum(-1)
        reward_loss = cross_entropy_loss(out["reward_logits"], tr_cat).sum(-1)
        target_e = jax.lax.stop_gradient(out["obs_embeddings"][:, 1:])
        obs_loss = predict_latent_loss(
            out["obs_pred"], target_e, base.mask,
            str(cfg.get("predict_latent_loss_type", "mse")),
        )
        normalize = bool(cfg.get("normalize_prob_of_sampled_actions", True))
        if self.discrete:
            # reference _calculate_policy_loss_disc over the transformer's
            # categorical head (sampled_unizero.py continuous=False branch):
            # CE between normalized visits at the K sampled actions and
            # log-softmax of the head at those actions, per obs position
            logits = out["policy_logits"]  # (B, K+1, A)
            acts = sampled.astype(jnp.int32)  # (B, K+1, Ks[, 1])
            if acts.ndim == 4:
                acts = acts[..., 0]
            logp_all = jax.nn.log_softmax(logits, axis=-1)
            logp = jnp.take_along_axis(logp_all, acts, axis=-1)  # (B, K+1, Ks)
            prob = jax.nn.softmax(logits, axis=-1)
            entropy = -jnp.sum(prob * logp_all, axis=-1).mean(-1)
        else:
            # visit-weighted Gaussian CE per obs position
            mu, sigma = out["mu"], out["sigma"]  # (B, K+1, D)
            logp = gaussian_tanh_logp(
                sampled, mu[:, :, None, :], sigma[:, :, None, :]
            )  # (B, K+1, Ks)
            entropy = jnp.sum(0.5 * jnp.log(2 * jnp.pi * jnp.e * sigma**2), axis=-1).mean(-1)
        if normalize:
            logp = logp - jax.lax.stop_gradient(
                jax.scipy.special.logsumexp(logp, axis=-1, keepdims=True)
            )
        policy_loss = -jnp.sum(base.target_policy * logp, axis=-1).sum(-1)
        pred_value0 = inverse_scalar_transform(out["value_logits"][:, 0], self.value_support)
        value_priority = jnp.abs(pred_value0 - base.target_value[:, 0])

        loss = (
            cfg.policy_loss_weight * policy_loss
            + cfg.value_loss_weight * value_loss
            + cfg.reward_loss_weight * reward_loss
            + cfg.obs_loss_weight * obs_loss
            + cfg.policy_entropy_weight * (-entropy)
        )
        logs = dict(
            policy_loss=jnp.mean(policy_loss),
            value_loss=jnp.mean(value_loss),
            reward_loss=jnp.mean(reward_loss),
            obs_loss=jnp.mean(obs_loss),
            policy_entropy=jnp.mean(entropy),
            predicted_value=jnp.mean(pred_value0),
            target_value=jnp.mean(base.target_value[:, 0]),
        )
        return loss, jnp.zeros(()), logs, value_priority

    def _loss_fn(self, params, batch, train_iter=None):
        loss, extra, logs, value_priority = self._sample_losses(
            params, batch, train_iter=train_iter
        )
        weighted_total_loss = jnp.mean(batch.base.weights * loss) + extra
        logs["total_loss"] = weighted_total_loss
        return weighted_total_loss / self.num_unroll_steps, (logs, value_priority)
