"""Gumbel AlphaZero policy (reference lzero/policy/gumbel_alphazero.py +
ctree_gumbel_alphazero/mcts_gumbel_alphazero.cpp): AlphaZero's
env-as-simulator search with Gumbel sequential-halving root selection,
trained on the completed-Q improved policy."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from lightzero_tpu.config import Config
from lightzero_tpu.policy.alphazero import AlphaZeroPolicy
from lightzero_tpu.search import RootOutput
from lightzero_tpu.search.gumbel import GumbelSearchConfig, batch_gumbel_search
from lightzero_tpu.utils import POLICY_REGISTRY


@POLICY_REGISTRY.register("gumbel_alphazero")
class GumbelAlphaZeroPolicy(AlphaZeroPolicy):
    @staticmethod
    def default_config() -> Config:
        cfg = AlphaZeroPolicy.default_config()
        cfg.type = "gumbel_alphazero"
        cfg.max_num_considered_actions = 6
        return cfg

    def __init__(self, cfg: Config, env, model=None):
        super().__init__(cfg, env, model=model)
        self.gumbel_cfg = GumbelSearchConfig(
            num_simulations=cfg.num_simulations,
            max_num_considered_actions=int(cfg.get("max_num_considered_actions", 6)),
            discount=1.0,
            players=2,
            value_delta_max=float(cfg.value_delta_max),
        )

    def _forward_collect(self, params, rng, env_state, temperature, deterministic=False):
        obs = jax.vmap(self.env.observation)(env_state)
        legal = jax.vmap(self.env.legal_mask)(env_state)
        to_play = env_state.to_play
        policy_logits, value = self.model.apply(params, obs)
        root = RootOutput(prior_logits=policy_logits, value=value, embedding=env_state)
        rng, s_rng = jax.random.split(rng)
        out = batch_gumbel_search(
            params, s_rng, root, self._recurrent_fn, self.gumbel_cfg, legal, to_play=to_play
        )
        actions = jnp.argmax(
            jnp.where(legal, out.improved_policy, -jnp.inf), axis=-1
        ).astype(jnp.int32)
        return dict(
            action=actions,
            # improved policy is the stored training target
            visit_counts=out.improved_policy,
            raw_visit_counts=out.visit_counts,
            searched_value=out.root_value,
            predicted_value=value,
            obs=obs,
        )
