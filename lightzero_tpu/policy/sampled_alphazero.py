"""Sampled AlphaZero policy (reference lzero/policy/sampled_alphazero.py):
AlphaZero whose search only considers a sampled subset of K legal actions
per node — the big-board variant (Sampled AlphaZero paper).

Fixed-shape TPU design: the action subset is a boolean mask obtained by
Gumbel-top-K over the policy logits (equivalent to sampling K actions
without replacement from the softmax), applied to the legal mask at the
root and at every expanded node.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from lightzero_tpu.config import Config
from lightzero_tpu.ops.action import sample_from_visit_counts
from lightzero_tpu.policy.alphazero import AlphaZeroPolicy
from lightzero_tpu.search import RecurrentOutput, RootOutput, batch_puct_search
from lightzero_tpu.utils import POLICY_REGISTRY


def gumbel_top_k_mask(rng, logits, legal, k):
    """Boolean mask selecting k legal actions ~ softmax(logits) without
    replacement (Gumbel-top-k trick); all legal actions if fewer than k."""
    g = jax.random.gumbel(rng, logits.shape, logits.dtype)
    scores = jnp.where(legal, logits + g, -jnp.inf)
    kth = jnp.sort(scores, axis=-1)[:, -k][:, None]
    mask = (scores >= kth) & legal
    # if fewer than k legal actions, keep them all
    few = jnp.sum(legal, axis=-1, keepdims=True) <= k
    return jnp.where(few, legal, mask)


@POLICY_REGISTRY.register("sampled_alphazero")
class SampledAlphaZeroPolicy(AlphaZeroPolicy):
    @staticmethod
    def default_config() -> Config:
        cfg = AlphaZeroPolicy.default_config()
        cfg.type = "sampled_alphazero"
        cfg.num_of_sampled_actions = 8
        return cfg

    def __init__(self, cfg: Config, env, model=None):
        super().__init__(cfg, env, model=model)
        self.K = int(cfg.get("num_of_sampled_actions", 8))

    def _recurrent_fn(self, params, rng, action, env_state) -> RecurrentOutput:
        out = super()._recurrent_fn(params, rng, action, env_state)
        sub = gumbel_top_k_mask(rng, out.prior_logits, out.legal_mask, self.K)
        return out._replace(legal_mask=sub)

    def _forward_collect(self, params, rng, env_state, temperature, deterministic=False):
        obs = jax.vmap(self.env.observation)(env_state)
        legal = jax.vmap(self.env.legal_mask)(env_state)
        to_play = env_state.to_play
        policy_logits, value = self.model.apply(params, obs)
        rng, k_rng, s_rng, a_rng = jax.random.split(rng, 4)
        root_legal = gumbel_top_k_mask(k_rng, policy_logits, legal, self.K)
        root = RootOutput(prior_logits=policy_logits, value=value, embedding=env_state)
        out = batch_puct_search(
            params,
            s_rng,
            root,
            self._recurrent_fn,
            self.search_cfg,
            root_legal,
            to_play=to_play,
            with_noise=not deterministic,
        )
        actions, _ = sample_from_visit_counts(
            a_rng, out.visit_counts, temperature, deterministic=deterministic
        )
        return dict(
            action=actions,
            visit_counts=out.visit_counts,
            searched_value=out.root_value,
            predicted_value=value,
            obs=obs,
        )
