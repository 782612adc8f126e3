"""Gumbel MuZero policy.

Capability-parity rebuild of reference lzero/policy/gumbel_muzero.py:
- collect/eval use the Gumbel search (sequential halving at the root); the
  executed action is argmax of the improved policy (:591-592);
- the stored training policy target IS the improved policy
  softmax(logits + σ(completedQ)) (:568-577), trained with
  KL/cross-entropy (:273,358-360) — the game buffer simply normalizes the
  stored distribution, so the same TrainBatch/GameBuffer machinery is
  reused with improved-policy rows in place of visit counts.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from lightzero_tpu.config import Config
from lightzero_tpu.ops import inverse_scalar_transform
from lightzero_tpu.policy.muzero import MuZeroPolicy
from lightzero_tpu.search import RootOutput
from lightzero_tpu.search.gumbel import GumbelSearchConfig, batch_gumbel_search
from lightzero_tpu.utils import POLICY_REGISTRY


@POLICY_REGISTRY.register("gumbel_muzero")
class GumbelMuZeroPolicy(MuZeroPolicy):
    @staticmethod
    def default_config() -> Config:
        cfg = MuZeroPolicy.default_config()
        cfg.type = "gumbel_muzero"
        cfg.max_num_considered_actions = 4
        return cfg

    def __init__(self, cfg: Config, model=None):
        super().__init__(cfg, model=model)
        self.gumbel_cfg = GumbelSearchConfig(
            num_simulations=cfg.num_simulations,
            max_num_considered_actions=int(cfg.get("max_num_considered_actions", 4)),
            discount=float(cfg.discount_factor),
            players=self.players,
            value_delta_max=float(cfg.value_delta_max),
        )

    def _forward_collect(
        self, params, rng, obs, legal_mask, to_play, temperature, epsilon, deterministic=False
    ):
        out0 = self._initial(params, obs)
        pred_value = inverse_scalar_transform(out0.value_logits, self.value_support)
        root = RootOutput(
            prior_logits=out0.policy_logits, value=pred_value, embedding=out0.latent_state
        )
        rng, s_rng = jax.random.split(rng)
        search_out = batch_gumbel_search(
            params, s_rng, root, self._recurrent_fn, self.gumbel_cfg, legal_mask, to_play=to_play
        )
        # action = argmax of the improved policy (gumbel_muzero.py:591-592)
        actions = jnp.argmax(
            jnp.where(legal_mask, search_out.improved_policy, -jnp.inf), axis=-1
        ).astype(jnp.int32)
        probs = search_out.improved_policy
        ent = -jnp.sum(
            jnp.where(probs > 0, probs * jnp.log2(jnp.maximum(probs, 1e-30)), 0.0), axis=-1
        )
        return dict(
            action=actions,
            # the stored policy target is the improved policy, not raw visits
            visit_counts=search_out.improved_policy,
            raw_visit_counts=search_out.visit_counts,
            searched_value=search_out.root_value,
            roots_completed_value=search_out.root_children_values,
            predicted_value=pred_value,
            policy_logits=out0.policy_logits,
            distribution_entropy=ent,
        )
