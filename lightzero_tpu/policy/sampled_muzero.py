"""Sampled MuZero policy (continuous action spaces).

Capability-parity rebuild of reference lzero/policy/sampled_muzero.py +
the sampled tree (lzero/mcts/ptree/ptree_sez.py): at every node K actions
are sampled from the tanh-squashed Gaussian policy head
(ptree_sez.py:102-124); the child prior used in pUCT is the density
normalized over the sampled set (compute_ucb_score node_prior='density',
ptree_sez.py:598-612) — which is exactly softmax over the stored log-probs,
so the generic fused pUCT kernel is reused with K action slots and the
sampled action VECTORS carried in the search embedding.

Learn (reference _calculate_policy_loss_cont, sampled_efficientzero.py:589):
policy loss = −Σ_j π̂(j)·log q(a_j|s) over the root's stored sampled actions
with π̂ = normalized visit counts; plus the usual value/reward CE and SSL.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from lightzero_tpu.config import Config
from lightzero_tpu.models.sampled_muzero import SampledMuZeroModel
from lightzero_tpu.ops import (
    cross_entropy_loss,
    inverse_scalar_transform,
    phi_transform,
    scalar_transform,
)
from lightzero_tpu.policy.muzero import MuZeroPolicy, TrainBatch, negative_cosine_similarity
from lightzero_tpu.search import RecurrentOutput, RootOutput, batch_puct_search
from lightzero_tpu.utils import POLICY_REGISTRY

_LOG_EPS = 1e-6


class SampledTrainBatch(NamedTuple):
    """TrainBatch + per-position root sampled actions (B, K+1, Ks, D)."""

    base: TrainBatch
    sampled_actions: jnp.ndarray


def gaussian_tanh_sample(rng, mu, sigma, num_samples, prior_space: str = "pre_tanh"):
    """Sample K tanh-squashed actions; returns (actions (B,K,D),
    prior log-weights (B,K)) (ptree_sez.py:106-114).

    ``prior_space`` selects the density used as the SEARCH prior over the
    sampled candidate set:
    - 'pre_tanh' (default): Gaussian density at the pre-squash point. The
      reference uses the action-space density (with the tanh-jacobian
      term, 'squashed' here), but that jacobian diverges as |a| -> 1, so
      the most-saturated candidate's prior dominates pUCT, visits pile
      onto it, and the CE loss then drags mu toward the bound — a
      one-sided saturation runaway diagnosed on Pendulum (mu pinned at
      -1.5 in every state by 10k steps, collect stuck at random level).
      Weighting the DISCRETE candidate set by the pre-tanh Gaussian keeps
      relative preferences without the divergence. The jacobian-corrected
      density stays in the TRAINING loss (gaussian_tanh_logp), where the
      change of variables is mathematically required.
    - 'squashed': the reference-exact prior (used by the ptree_sez golden
      test).
    """
    B, D = mu.shape
    x = mu[:, None, :] + sigma[:, None, :] * jax.random.normal(rng, (B, num_samples, D), mu.dtype)
    a = jnp.tanh(x)
    logp = _normal_logp(x, mu[:, None, :], sigma[:, None, :])
    if prior_space == "squashed":
        logp = logp - jnp.sum(jnp.log(1.0 - a**2 + _LOG_EPS), axis=-1)
    return a, logp


def sample_discrete_actions(rng, logits, num_samples, legal_mask=None):
    """K DISTINCT actions via Gumbel-top-K — equivalent in distribution to
    the reference's torch.multinomial(prob, K, replacement=False)
    (ptree_sez.py:134). Returns (actions (B, K) int32, logp (B, K)) where
    logp = log softmax over the (masked) action space at the sampled
    actions; the fused kernel's softmax over the K slots then reproduces
    the reference's prior/sum(sibling priors) pUCT prior exactly
    (ptree_sez.py compute_ucb_score node_prior='density', line 612)."""
    if legal_mask is not None:
        logits = jnp.where(legal_mask, logits, -jnp.inf)
    g = jax.random.gumbel(rng, logits.shape, logits.dtype)
    _, actions = jax.lax.top_k(logits + g, num_samples)
    logp_all = jax.nn.log_softmax(jnp.where(jnp.isfinite(logits), logits, -1e9), axis=-1)
    logp = jnp.take_along_axis(logp_all, actions, axis=-1)
    return actions.astype(jnp.int32), logp


def sampled_search_prior(cfg, logp):
    """Priors over the K sampled slots fed to pUCT.

    The reference's PRODUCTION C++ sampled tree uses a UNIFORM empirical
    distribution over the sampled children — its own comment reads
    "uniform is very important to the performance of sampled algo"
    (ctree_sampled_muzero/lib/cnode.cpp:1016) — which is also the Sampled
    MuZero paper's beta-correction with beta=pi. Its ptree mirror instead
    uses 'density' (ptree_sez.py:598), which round-3/4 runs showed creates
    a sigma-collapse feedback loop: central candidates get higher prior ->
    more visits -> the visit-weighted CE pulls sigma down -> candidates
    cluster tighter -> mu never moves off its init. Default 'uniform';
    'density' is kept for golden parity tests vs the ptree."""
    if str(cfg.get("sampled_node_prior", "uniform")) == "uniform":
        return jnp.zeros_like(logp)
    return logp


def _normal_logp(x, mu, sigma):
    return jnp.sum(
        -0.5 * ((x - mu) / sigma) ** 2 - jnp.log(sigma) - 0.5 * jnp.log(2 * jnp.pi), axis=-1
    )


def gaussian_tanh_logp(actions, mu, sigma):
    """log q(a) for stored squashed actions a (..., D) under (mu, sigma)."""
    a = jnp.clip(actions, -1.0 + 1e-6, 1.0 - 1e-6)
    x = jnp.arctanh(a)
    logp = _normal_logp(x, mu, sigma)
    return logp - jnp.sum(jnp.log(1.0 - a**2 + _LOG_EPS), axis=-1)


@POLICY_REGISTRY.register("sampled_muzero")
class SampledMuZeroPolicy(MuZeroPolicy):
    @staticmethod
    def default_config() -> Config:
        cfg = MuZeroPolicy.default_config()
        cfg.type = "sampled_muzero"
        cfg.num_of_sampled_actions = 20
        cfg.normalize_prob_of_sampled_actions = False
        # pUCT prior over sampled slots: 'uniform' (reference C++ default,
        # cnode.cpp:1016) or 'density' (ptree mirror) — see
        # sampled_search_prior
        cfg.sampled_node_prior = "uniform"
        cfg.model.continuous_action_space = True
        cfg.model.self_supervised_learning_loss = True
        cfg.ssl_loss_weight = 2.0
        cfg.policy_entropy_weight = 5e-3
        return cfg

    def __init__(self, cfg: Config, model=None):
        self.K = int(cfg.get("num_of_sampled_actions", 20))
        self.action_dim = int(cfg.model.action_space_size)
        # discrete sampled (reference continuous_action_space=False branch):
        # K candidates drawn without replacement from the categorical head
        self.discrete = not bool(cfg.model.get("continuous_action_space", True))
        if model is None:
            scale = cfg.model.get("support_scale", 300)
            model_cfg = Config(dict(cfg.model))
            model_cfg.value_support_size = int(2 * scale + 1)
            model_cfg.reward_support_size = int(2 * scale + 1)
            model = SampledMuZeroModel.from_config(model_cfg)
        super().__init__(cfg, model=model)

    # ------------------------------------------------------------ inference
    def _initial(self, params, obs):
        return self.model.apply(params, obs, method=SampledMuZeroModel.initial_inference)

    def _bootstrap_value_fn(self, target_params, obs):
        out = self._initial(target_params, obs)
        return inverse_scalar_transform(out["value_logits"], self.value_support)

    def _sample_candidates(self, rng, out, legal_mask=None):
        """K candidate actions + prior log-weights from a net output dict."""
        if self.discrete:
            return sample_discrete_actions(
                rng, out["policy_logits"], self.K, legal_mask=legal_mask
            )
        return gaussian_tanh_sample(rng, out["mu"], out["sigma"], self.K)

    def _recurrent_fn(self, params, rng, slot, emb) -> RecurrentOutput:
        B = emb["latent"].shape[0]
        bidx = jnp.arange(B)
        action = emb["sampled_actions"][bidx, slot]  # (B, D) cont / (B,) int
        out = self.model.apply(
            params, emb["latent"], action, method=SampledMuZeroModel.recurrent_inference
        )
        new_actions, logp = self._sample_candidates(rng, out)
        return RecurrentOutput(
            reward=inverse_scalar_transform(out["reward_logits"], self.reward_support),
            value=inverse_scalar_transform(out["value_logits"], self.value_support),
            prior_logits=sampled_search_prior(self.cfg, logp),
            embedding=dict(latent=out["latent_state"], sampled_actions=new_actions),
        )

    def _forward_collect(
        self, params, rng, obs, legal_mask, to_play, temperature, epsilon, deterministic=False
    ):
        from lightzero_tpu.ops.action import sample_from_visit_counts

        out0 = self._initial(params, obs)
        B = obs.shape[0]
        rng, r_rng, s_rng, a_rng = jax.random.split(rng, 4)
        root_actions, root_logp = self._sample_candidates(
            r_rng, out0, legal_mask=legal_mask if self.discrete else None
        )
        pred_value = inverse_scalar_transform(out0["value_logits"], self.value_support)
        root = RootOutput(
            prior_logits=sampled_search_prior(self.cfg, root_logp),
            value=pred_value,
            embedding=dict(latent=out0["latent_state"], sampled_actions=root_actions),
        )
        slots_legal = jnp.ones((B, self.K), bool)
        search_out = batch_puct_search(
            params,
            s_rng,
            root,
            self._recurrent_fn,
            self.search_cfg,
            slots_legal,
            to_play=to_play,
            # Dirichlet noise over K sampled candidates (reference
            # sampled roots.prepare mixes noise into sampled priors)
            with_noise=not deterministic,
        )
        slot, dist_entropy = sample_from_visit_counts(
            a_rng, search_out.visit_counts, temperature, deterministic=deterministic
        )
        action = root_actions[jnp.arange(B), slot]  # (B, D) in [-1, 1] / (B,) int
        out = dict(
            action=action,
            chosen_slot=slot,
            visit_counts=search_out.visit_counts,
            root_sampled_actions=root_actions,
            searched_value=search_out.root_value,
            predicted_value=pred_value,
            distribution_entropy=dist_entropy,
        )
        if not self.discrete:
            # live diagnosis telemetry: where do the search targets pull mu?
            vw = search_out.visit_counts.astype(jnp.float32)
            vw = vw / jnp.maximum(jnp.sum(vw, axis=-1, keepdims=True), 1.0)
            visit_mean_action = jnp.einsum("bk,bkd->bd", vw, root_actions)
            out.update(
                visit_mean_action=jnp.mean(visit_mean_action, axis=-1),
                collect_mu=jnp.mean(jnp.tanh(out0["mu"]), axis=-1),
                collect_sigma=jnp.mean(out0["sigma"], axis=-1),
            )
        return out

    # ---------------------------------------------------------------- learn
    def _loss_fn(self, params, batch):
        base: TrainBatch = batch.base
        sampled = batch.sampled_actions  # (B, K+1, Ks, D)
        cfg = self.cfg
        K = self.num_unroll_steps
        M = SampledMuZeroModel
        tv_cat = phi_transform(self.value_support, scalar_transform(base.target_value))
        tr_cat = phi_transform(self.reward_support, scalar_transform(base.target_reward))

        out0 = self._initial(params, base.obs[:, 0])

        normalize = bool(cfg.get("normalize_prob_of_sampled_actions", False))

        def policy_loss_at(out, k):
            if self.discrete:
                # reference _calculate_policy_loss_disc
                # (sampled_muzero.py:694-780): CE between normalized root
                # visit counts over the K sampled actions and log softmax of
                # the categorical head at those actions
                logits = out["policy_logits"]  # (B, A)
                acts = sampled[:, k].astype(jnp.int32)  # (B, Ks[, 1])
                if acts.ndim == 3:
                    acts = acts[..., 0]
                logp_all = jax.nn.log_softmax(logits, axis=-1)
                logp = jnp.take_along_axis(logp_all, acts, axis=-1)  # (B, Ks)
                prob = jax.nn.softmax(logits, axis=-1)
                ent = -jnp.sum(prob * logp_all, axis=-1)
            else:
                mu, sigma = out["mu"], out["sigma"]
                logp = gaussian_tanh_logp(sampled[:, k], mu[:, None, :], sigma[:, None, :])
                ent = jnp.sum(
                    0.5 * jnp.log(2 * jnp.pi * jnp.e * sigma**2), axis=-1
                )  # Gaussian entropy (pre-squash)
            if normalize:
                # normalize densities over the K candidates with a DETACHED
                # denominator (reference normalize_prob_of_sampled_actions,
                # sampled_efficientzero.py:673-679) — removes the incentive
                # to inflate absolute density (sigma collapse)
                logp = logp - jax.lax.stop_gradient(
                    jax.scipy.special.logsumexp(logp, axis=-1, keepdims=True)
                )
            target = base.target_policy[:, k]  # (B, Ks) normalized visits
            loss = -jnp.sum(target * logp, axis=-1)
            return loss, ent

        value_loss = cross_entropy_loss(out0["value_logits"], tv_cat[:, 0])
        policy_loss, entropy = policy_loss_at(out0, 0)
        policy_entropy_loss = -entropy
        pred_value0 = inverse_scalar_transform(out0["value_logits"], self.value_support)
        value_priority = jnp.abs(pred_value0 - base.target_value[:, 0])

        latent = out0["latent_state"]
        reward_loss = jnp.zeros_like(value_loss)
        consistency_loss = jnp.zeros_like(value_loss)
        ssl = cfg.ssl_loss_weight > 0

        for k in range(K):
            rec = self.model.apply(
                params, latent, base.actions[:, k], method=M.recurrent_inference
            )
            latent = rec["latent_state"]
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
            pl, ent = policy_loss_at(rec, k + 1)
            policy_loss = policy_loss + pl
            policy_entropy_loss = policy_entropy_loss - ent
            value_loss = value_loss + cross_entropy_loss(rec["value_logits"], tv_cat[:, k + 1])
            reward_loss = reward_loss + cross_entropy_loss(rec["reward_logits"], tr_cat[:, k])

        loss = (
            cfg.ssl_loss_weight * consistency_loss
            + cfg.policy_loss_weight * policy_loss
            + cfg.value_loss_weight * value_loss
            + cfg.reward_loss_weight * reward_loss
            + cfg.policy_entropy_weight * policy_entropy_loss
        )
        weighted_total_loss = jnp.mean(base.weights * loss)
        scaled_loss = weighted_total_loss / K
        logs = dict(
            total_loss=weighted_total_loss,
            policy_loss=jnp.mean(policy_loss),
            value_loss=jnp.mean(value_loss),
            reward_loss=jnp.mean(reward_loss),
            consistency_loss=jnp.mean(consistency_loss),
            policy_entropy=jnp.mean(entropy),
            predicted_value=jnp.mean(pred_value0),
            target_value=jnp.mean(base.target_value[:, 0]),
        )
        return scaled_loss, (logs, value_priority)
