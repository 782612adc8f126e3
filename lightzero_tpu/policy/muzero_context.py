"""MuZero-Context policy (reference lzero/model/muzero_context_model.py:219-265
+ the conv_context branches of lzero/policy/muzero.py:686-975).

Training is IDENTICAL to MuZero. Inference differs: the root latent at each
real env step is the *recursively predicted* latent — roll the dynamics
network from the previous step's latent with the executed action — instead of
re-encoding the observation every step (the UniZero-paper "k-step recursive
root latent"). The observation IS re-encoded (a) on the first step of an
episode and (b) as a hard context reset every ``context_length_init`` steps
(reference muzero_context_model.py:251-256).

TPU-native design: the reference keeps ``self.latent_state``/``self.timestep``
as mutable module attributes updated per collector call; here the context is
an explicit ``(latent, last_action, timestep)`` pytree threaded through the
collector's fused `lax.scan` via the stateful-collect API (the same surface
UniZero's KV cache uses), with per-env — not batch-global — reset/re-encode
decisions via ``jnp.where``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from lightzero_tpu.config import Config
from lightzero_tpu.models.muzero import MuZeroModel
from lightzero_tpu.ops import inverse_scalar_transform
from lightzero_tpu.ops.action import sample_from_visit_counts
from lightzero_tpu.policy.muzero import MuZeroPolicy
from lightzero_tpu.search import RootOutput, batch_puct_search
from lightzero_tpu.utils import POLICY_REGISTRY


@POLICY_REGISTRY.register("muzero_context")
class MuZeroContextPolicy(MuZeroPolicy):
    """MuZero w/ recursively-predicted root context. Learn/reanalyze are
    inherited unchanged from MuZeroPolicy (reference trains it with the plain
    MuZero loss, muzero_context_model.py:243-246 train branch)."""

    stateful_collect = True

    @staticmethod
    def default_config() -> Config:
        cfg = MuZeroPolicy.default_config()
        cfg.type = "muzero_context"
        # hard-reset period of the recursive root latent
        # (reference muzero_context_model.py context_length_init=5)
        cfg.context_length_init = 5
        return cfg

    # ---------------------------------------------------- stateful collect
    def init_collect_state(self, batch_size: int):
        """(latent, last_action=-1, timestep=0); latent shape follows the
        model type (mlp: (B, L); conv: (B, H, W, C))."""
        model = self.model
        if getattr(model, "model_type", "mlp") == "mlp":
            latent = jnp.zeros((batch_size, model.latent_state_dim), jnp.float32)
        else:
            h, w = model.observation_shape[0], model.observation_shape[1]
            f = 16 if model.downsample else 1
            latent = jnp.zeros((batch_size, h // f, w // f, model.num_channels), jnp.float32)
        return dict(
            latent=latent,
            last_action=jnp.full((batch_size,), -1, jnp.int32),
            timestep=jnp.zeros((batch_size,), jnp.int32),
        )

    def reset_collect_state(self, state, done):
        """Per-env: done envs restart with action=-1 (forces re-encode)."""

        def sel(fresh, cur):
            extra = (1,) * (cur.ndim - 1)
            return jnp.where(done.reshape(-1, *extra), fresh, cur)

        return dict(
            latent=sel(jnp.zeros_like(state["latent"]), state["latent"]),
            last_action=sel(jnp.full_like(state["last_action"], -1), state["last_action"]),
            timestep=sel(jnp.zeros_like(state["timestep"]), state["timestep"]),
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
        M = MuZeroModel
        encoded = self.model.apply(params, obs, method=M.representation)
        # roll the world model one real step with the executed action
        safe_action = jnp.maximum(collect_state["last_action"], 0)
        rolled, _ = self.model.apply(
            params, collect_state["latent"], safe_action, method=M.dynamics
        )
        # re-encode at episode start (action == -1) or every context_length
        # steps (reference muzero_context_model.py:249-256: the timestep
        # check happens AFTER the recurrent update, i.e. on the rolled state)
        ctx = int(self.cfg.get("context_length_init", 5))
        reencode = (collect_state["last_action"] < 0) | (
            (collect_state["timestep"] % ctx == 0) & (collect_state["timestep"] > 0)
        )
        extra = (1,) * (encoded.ndim - 1)
        root_latent = jnp.where(reencode.reshape(-1, *extra), encoded, rolled)

        value_logits, policy_logits = self.model.apply(
            params, root_latent, method=M.prediction
        )
        pred_value = inverse_scalar_transform(value_logits, self.value_support)
        root = RootOutput(
            prior_logits=policy_logits, value=pred_value, embedding=root_latent
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
        rand_action = jax.random.categorical(
            u_rng, jnp.where(legal_mask, 0.0, -jnp.inf), axis=-1
        )
        explore = jax.random.uniform(e_rng, (B,)) < epsilon
        actions = jnp.where(explore & ~jnp.asarray(deterministic), rand_action, actions)

        new_state = dict(
            latent=root_latent,
            last_action=actions.astype(jnp.int32),
            timestep=collect_state["timestep"] + 1,
        )
        out = dict(
            action=actions,
            visit_counts=search_out.visit_counts,
            searched_value=search_out.root_value,
            predicted_value=pred_value,
            policy_logits=policy_logits,
            distribution_entropy=dist_entropy,
        )
        return out, new_state
