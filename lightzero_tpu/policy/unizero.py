"""UniZero policy.

Capability-parity rebuild of reference lzero/policy/unizero.py:
- learn = world-model sequence loss (obs-embedding prediction + reward CE +
  value CE + policy CE, unizero.py:~800-1300 / world_model.compute_loss
  :1852) over (obs, action, reward, value, policy) sequence batches — the
  standard TrainBatch IS the sequence batch (K = context steps);
- collect keeps a per-env rolling KV cache across real steps (the
  reference's last_batch_obs/last_batch_action context, unizero.py:1342-
  1350), exposed to the collector via the stateful-collect API;
- the search carries a PER-NODE copy of the KV cache in the embedding:
  one search step appends [action token, predicted-obs token]
  (forward_recurrent_inference, world_model.py:1420-1504), all inside the
  fused jitted search.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

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
from lightzero_tpu.policy.muzero import MuZeroPolicy, TrainBatch
from lightzero_tpu.search import (
    RecurrentOutput,
    RootOutput,
    batch_puct_search,
)
from lightzero_tpu.utils import POLICY_REGISTRY


def predict_latent_loss(pred, target, mask, loss_type: str, group_size: int = 8):
    """Next-latent prediction loss per sample: (B, K, D) pred/target ->
    (B,) masked sum over unroll steps (reference world_model.py:2055-2076).

    'mse' pairs with LayerNorm latents; 'group_kl' treats each simnorm
    group as a distribution and sums KL within groups — the small
    per-group probability shifts carrying action information are
    first-order in KL but second-order in MSE."""
    if loss_type == "group_kl":
        eps = 1e-6
        B, K, D = pred.shape
        G = D // group_size
        p = pred.reshape(B, K, G, group_size) + eps
        t = target.reshape(B, K, G, group_size) + eps
        kl = jnp.sum(t * (jnp.log(t) - jnp.log(p)), axis=-1).mean(-1)  # (B, K)
        return jnp.sum(kl * mask, axis=-1)
    return jnp.sum(jnp.mean((pred - target) ** 2, axis=-1) * mask, axis=-1)


@POLICY_REGISTRY.register("unizero")
class UniZeroPolicy(MuZeroPolicy):
    stateful_collect = True

    @staticmethod
    def default_config() -> Config:
        cfg = MuZeroPolicy.default_config()
        cfg.type = "unizero"
        cfg.num_unroll_steps = 10  # sequence/context length in steps
        cfg.model.embed_dim = 256
        cfg.model.num_layers = 2
        cfg.model.num_heads = 8
        cfg.model.max_tokens = 32
        cfg.obs_loss_weight = 10.0
        # next-latent prediction loss (reference predict_latent_loss_type,
        # unizero.py:194-201): 'mse' for LayerNorm latents, 'group_kl' for
        # SimNorm latents (KL within each simnorm group amplifies the small
        # per-group probability shifts that MSE under-weights)
        cfg.predict_latent_loss_type = "mse"
        cfg.target_update_freq = 100
        # tokenizer-decoder reconstruction loss (tokenizer.py:283-301);
        # > 0 instantiates the decoder
        cfg.latent_recon_loss_weight = 0.0
        # LPIPS perceptual term on decoded image obs (tokenizer.py:283-301
        # perceptual_loss_weight; requires latent_recon_loss_weight > 0 so
        # the decoder exists and image observations)
        cfg.perceptual_loss_weight = 0.0
        # adaptive policy-entropy temperature: learned log_alpha against a
        # decaying target entropy (reference unizero.py:1036-1100)
        cfg.use_adaptive_entropy_weight = True
        cfg.target_entropy_start_ratio = 0.98
        # reference end ratio is 0.05 (unizero.py:264) — an end ratio near
        # 1.0 keeps alpha pushing the policy toward uniform forever, which
        # caps how decisive the search priors can get
        cfg.target_entropy_end_ratio = 0.05
        # reference decays over 500k train iters (unizero.py:266); our runs
        # are ~10x shorter, so the default anneals over 1e5
        cfg.target_entropy_decay_steps = int(1e5)
        # dedicated lr for log_alpha (reference uses a separate Adam at
        # 1e-3, unizero.py:724-725; inside the main AdamW the alpha step
        # would be ~lr=1e-4, 10x too slow)
        cfg.adaptive_entropy_alpha_lr = 1e-3
        # Encoder-Clip: rescale encoder weights when the max obs-embedding
        # norm exceeds an annealed threshold (unizero.py:1106-1137)
        cfg.use_encoder_clip_annealing = False
        cfg.encoder_clip_start = 30.0
        cfg.encoder_clip_end = 10.0
        cfg.encoder_clip_anneal_steps = int(1e5)
        cfg.encoder_clip_anneal_type = "cosine"
        # Head-Clip: annealed max-|logits| threshold per prediction head
        # (reference head_clip_manager.py; disabled by default as there)
        cfg.use_head_clip = False
        cfg.head_clip_start = 30.0
        cfg.head_clip_end = 15.0
        cfg.head_clip_anneal_steps = int(1e5)
        cfg.head_clip_anneal_type = "cosine"
        # nanoGPT-style selective weight decay: AdamW decay applied only to
        # rank>=2 kernels, not biases/LayerNorm/embeddings (reference
        # configure_optimizers_nanogpt, lzero/policy/utils.py:275)
        cfg.selective_weight_decay = True
        cfg.weight_decay = 1e-4
        cfg.optim_type = "AdamW"  # reference unizero.py:404
        cfg.learning_rate = 1e-4
        # gradient accumulation: micro-batches averaged inside ONE jitted
        # step (reference accumulates across train iters, unizero.py:1032;
        # same effective update)
        cfg.accumulation_steps = 1
        # reanalyze roots threaded with the true (obs, action) history
        # context (game_buffer_unizero.py:400,544); 0 = fresh single-obs root
        cfg.reanalyze_context_steps = 4
        # drift-correction loss weight (round-5 original addition, motivated
        # by MuZero's unrolled-latent training): a second forward pass with
        # the model's OWN 1-step predicted obs embeddings substituted for
        # the real ones, applying reward/value/policy CE there too. The
        # fused search rolls the WM autoregressively (_recurrent_fn feeds
        # obs_pred back), but the teacher-forced loss never trains the heads
        # on those self-generated tokens — so the search can hallucinate
        # rewards and produce decisive-but-wrong visit targets
        # (scripts/diag_uz_hallucination.py measures this). 0 = off.
        cfg.drift_correction_weight = 0.0
        # iterated correction passes: pass k substitutes pass (k-1)'s
        # obs_pred, so pass 2 trains the heads on depth-2 drift states etc.
        # The search adversarially SELECTS the most value-inflated branches
        # (winner's curse over WM noise), so correcting only depth-1 leaves
        # deep-leaf backups optimistic (v8 telemetry: searched_value still
        # 5-10x true with visit entropy 0.24).
        cfg.drift_correction_depth = 1
        return cfg

    # the GameBuffer supplies (obs history, action history) to reanalyze
    reanalyze_needs_context = True

    def __init__(self, cfg: Config, model=None):
        if model is None:
            scale = cfg.model.get("support_scale", 300)
            model_cfg = Config(dict(cfg.model))
            model_cfg.value_support_size = int(2 * scale + 1)
            model_cfg.reward_support_size = int(2 * scale + 1)
            if float(cfg.get("latent_recon_loss_weight", 0.0)) > 0:
                model_cfg.with_decoder = True
            model = UniZeroModel.from_config(model_cfg)
        super().__init__(cfg, model=model)

    # ------------------------------------------------- curriculum LoRA
    def _make_optimizer(self):
        import optax

        opt = super()._make_optimizer()
        if bool(self.cfg.get("use_adaptive_entropy_weight", False)):
            # dedicated Adam for log_alpha (reference unizero.py:724-725):
            # the alpha loss is a single scalar whose gradient is
            # (entropy - target); routing it through the main AdamW would
            # move it at the model lr and apply weight decay to it
            alpha_opt = optax.adam(float(self.cfg.get("adaptive_entropy_alpha_lr", 1e-3)))

            def alpha_labels(params):
                flat = jax.tree_util.tree_map_with_path(
                    lambda path, _: "alpha"
                    if any(getattr(k, "key", None) == "log_alpha" for k in path)
                    else "model",
                    params,
                )
                return flat

            opt = optax.multi_transform({"model": opt, "alpha": alpha_opt}, alpha_labels)
        mcfg = self.cfg.model
        if int(mcfg.get("lora_r", 0)) > 0 and int(mcfg.get("curriculum_stage_num", 1)) > 1:
            from lightzero_tpu.models.unizero_world_model.transformer import (
                curriculum_trainable_mask,
            )

            stage = getattr(
                self, "_curriculum_stage", int(mcfg.get("curriculum_stage", 0))
            )

            def labels(p):
                return jax.tree_util.tree_map(
                    lambda b: "train" if b else "freeze",
                    curriculum_trainable_mask(p, stage),
                )

            # NOTE: optax.masked passes raw gradients THROUGH for unmasked
            # leaves — frozen params need explicitly zeroed updates
            opt = optax.multi_transform(
                {"train": opt, "freeze": optax.set_to_zero()}, labels
            )
        return opt

    def set_curriculum_stage(self, stage: int):
        """Advance the CurriculumLoRA stage (reference set_curriculum_stage,
        transformer.py:129-219 + the balance entry's stage switching,
        train_unizero_multitask_balance_segment_ddp.py:416-460). The stage is
        a STATIC model attribute, so this re-specializes the model and
        rebuilds the optimizer with the stage's trainable-parameter mask;
        the caller must re-init opt_state (param structure is unchanged)."""
        import dataclasses

        self.model = dataclasses.replace(self.model, curriculum_stage=stage)
        self._curriculum_stage = stage
        self.optimizer = self._make_optimizer()
        for attr in ("_jit_reanalyze",):
            if hasattr(self, attr):
                delattr(self, attr)
        self._jit_learn = jax.jit(self._forward_learn, donate_argnums=(0,))
        self._jit_collect = jax.jit(
            self._forward_collect, static_argnames=("deterministic",)
        )

    # ---------------------------------------------------- stateful collect
    def _fresh_cache(self, batch_size: int):
        from lightzero_tpu.models.unizero_world_model.transformer import (
            TransformerConfig,
            init_kv_cache,
        )

        tcfg = TransformerConfig(
            num_layers=self.model.num_layers,
            num_heads=self.model.num_heads,
            embed_dim=self.model.embed_dim,
            max_tokens=self.model.max_tokens,
            context_window=self.model.context_window,
        )
        return init_kv_cache(tcfg, batch_size)

    def init_collect_state(self, batch_size: int):
        """Rolling per-env KV cache (reset at episode boundaries)."""
        return self._fresh_cache(batch_size)

    def reset_collect_state(self, state, done):
        """Zero the cache rows of done envs."""
        fresh = jax.tree_util.tree_map(jnp.zeros_like, state)
        fresh = fresh._replace(pos=jnp.full_like(state.pos, -1))

        def sel(a, b):
            extra = (1,) * (a.ndim - 1)
            return jnp.where(done.reshape(-1, *extra), a, b)

        return jax.tree_util.tree_map(sel, fresh, state)

    # ------------------------------------------------------------ inference
    def _recurrent_fn(self, params, rng, action, emb) -> RecurrentOutput:
        cache = emb["cache"]
        tid = self._task_ids(action.shape[0])
        a_out, cache = self.model.apply(
            params, cache, action, tid, method=UniZeroModel.infer_action_step
        )
        o_out, cache = self.model.apply(
            params, cache, a_out["obs_pred"], tid, method=UniZeroModel.infer_obs_step
        )
        return RecurrentOutput(
            reward=inverse_scalar_transform(a_out["reward_logits"], self.reward_support),
            value=inverse_scalar_transform(o_out["value_logits"], self.value_support),
            prior_logits=o_out["policy_logits"],
            embedding=dict(cache=cache),
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
        obs_e = self.model.apply(params, obs, method=UniZeroModel.encode_obs)
        o_out, cache = self.model.apply(
            params, collect_state, obs_e, self._task_ids(obs.shape[0]),
            method=UniZeroModel.infer_obs_step,
        )
        pred_value = inverse_scalar_transform(o_out["value_logits"], self.value_support)
        root = RootOutput(
            prior_logits=o_out["policy_logits"],
            value=pred_value,
            embedding=dict(cache=cache),
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
        rand_action = jax.random.categorical(u_rng, jnp.where(legal_mask, 0.0, -jnp.inf), axis=-1)
        explore = jax.random.uniform(e_rng, (B,)) < epsilon
        actions = jnp.where(explore & ~jnp.asarray(deterministic), rand_action, actions)
        # advance the TRUE context with the chosen action token only (the
        # real next obs arrives at the next env step)
        _, new_state = self.model.apply(
            params, cache, actions, self._task_ids(obs.shape[0]),
            method=UniZeroModel.infer_action_step,
        )
        out = dict(
            action=actions,
            visit_counts=search_out.visit_counts,
            searched_value=search_out.root_value,
            predicted_value=pred_value,
            policy_logits=o_out["policy_logits"],
            distribution_entropy=dist_entropy,
        )
        return out, new_state

    # ---------------------------------------------------------------- learn
    def _sample_losses(self, params, batch: TrainBatch, task_id=None, train_iter=None):
        """Per-sample loss vector before IS weighting (see MuZeroPolicy.
        _sample_losses). ``task_id`` (B,) conditions the world model's task
        embedding (reference task_emb routing, world_model_multitask.py)."""
        cfg = self.cfg
        K = self.num_unroll_steps
        tv_cat = phi_transform(self.value_support, scalar_transform(batch.target_value))
        tr_cat = phi_transform(self.reward_support, scalar_transform(batch.target_reward))

        out = self.model.apply(
            params, batch.obs, batch.actions, task_id, method=UniZeroModel.train_forward
        )
        # value/policy at every obs position 0..K
        value_loss = cross_entropy_loss(out["value_logits"], tv_cat).sum(-1)
        policy_loss = cross_entropy_loss(out["policy_logits"], batch.target_policy).sum(-1)
        reward_loss = cross_entropy_loss(out["reward_logits"], tr_cat).sum(-1)
        # next-obs embedding prediction (masked beyond trajectory)
        target_e = jax.lax.stop_gradient(out["obs_embeddings"][:, 1:])  # (B, K, D)
        obs_loss = predict_latent_loss(
            out["obs_pred"], target_e, batch.mask,
            str(cfg.get("predict_latent_loss_type", "mse")),
        )
        prob = jax.nn.softmax(out["policy_logits"][:, 0], axis=-1)
        entropy = -jnp.sum(prob * jnp.log(jnp.maximum(prob, 1e-9)), axis=-1)
        pred_value0 = inverse_scalar_transform(out["value_logits"][:, 0], self.value_support)
        value_priority = jnp.abs(pred_value0 - batch.target_value[:, 0])

        # adaptive entropy temperature (reference unizero.py:1036-1100):
        # alpha_loss = log_alpha * (entropy - target_entropy).detach();
        # the policy term uses alpha = exp(log_alpha).detach()
        alpha_loss = jnp.zeros(())
        entropy_weight = jnp.asarray(float(cfg.policy_entropy_weight))
        if bool(cfg.get("use_adaptive_entropy_weight", False)):
            log_alpha = params["params"]["log_alpha"]
            it = jnp.asarray(0, jnp.float32) if train_iter is None else train_iter.astype(jnp.float32)
            progress = jnp.minimum(1.0, it / float(cfg.target_entropy_decay_steps))
            ratio = (
                float(cfg.target_entropy_start_ratio) * (1.0 - progress)
                + float(cfg.target_entropy_end_ratio) * progress
            )
            A = int(self.cfg.model.action_space_size)
            target_entropy = jnp.log(jnp.asarray(float(A))) * ratio
            mean_entropy = jnp.mean(entropy)
            alpha_loss = log_alpha * jax.lax.stop_gradient(mean_entropy - target_entropy)
            entropy_weight = jax.lax.stop_gradient(jnp.exp(log_alpha))

        # tokenizer-decoder latent reconstruction (tokenizer.py:283-301)
        recon_w = float(cfg.get("latent_recon_loss_weight", 0.0))
        latent_recon_loss = jnp.zeros(())
        if recon_w > 0:
            B, K1 = batch.obs.shape[:2]
            emb_flat = out["obs_embeddings"].reshape(B * K1, -1)
            recon = self.model.apply(params, emb_flat, method=UniZeroModel.decode_obs)
            obs_flat = batch.obs.reshape((B * K1,) + batch.obs.shape[2:])
            latent_recon_loss = jnp.mean((recon - obs_flat) ** 2)
            pw = float(cfg.get("perceptual_loss_weight", 0.0))
            if pw > 0 and recon.ndim == 4:  # image obs only
                from lightzero_tpu.ops.lpips import lpips_distance

                latent_recon_loss = latent_recon_loss + (pw / recon_w) * jnp.mean(
                    lpips_distance(jnp.clip(recon, 0.0, 1.0),
                                   jnp.clip(obs_flat, 0.0, 1.0))
                )

        # drift correction: re-run the sequence with the model's own 1-step
        # predicted obs embeddings (exactly the depth-1 tokens the search
        # rolls over) and train reward/value/policy heads to stay correct
        # there. stop_gradient on the predictions: this corrects the heads
        # and trunk ON drifted inputs without dragging obs_pred toward them.
        dc_w = float(cfg.get("drift_correction_weight", 0.0))
        dc_depth = int(cfg.get("drift_correction_depth", 1))
        dc_reward_loss = jnp.zeros(())
        if dc_w > 0:
            drift_loss = jnp.zeros(batch.obs.shape[0])
            prev = out
            for _d in range(dc_depth):
                obs_ed = jnp.concatenate(
                    [out["obs_embeddings"][:, :1],
                     jax.lax.stop_gradient(prev["obs_pred"])], axis=1)
                outd = self.model.apply(
                    params, obs_ed, batch.actions, task_id,
                    method=UniZeroModel.train_forward_embedded)
                dc_reward = cross_entropy_loss(outd["reward_logits"], tr_cat).sum(-1)
                dc_value = cross_entropy_loss(
                    outd["value_logits"][:, 1:], tv_cat[:, 1:]).sum(-1)
                dc_policy = cross_entropy_loss(
                    outd["policy_logits"][:, 1:], batch.target_policy[:, 1:]).sum(-1)
                drift_loss = drift_loss + (
                    cfg.reward_loss_weight * dc_reward
                    + cfg.value_loss_weight * dc_value
                    + cfg.policy_loss_weight * dc_policy
                ) / dc_depth
                dc_reward_loss = dc_reward_loss + jnp.mean(dc_reward) / dc_depth
                prev = outd
        loss = (
            cfg.policy_loss_weight * policy_loss
            + cfg.value_loss_weight * value_loss
            + cfg.reward_loss_weight * reward_loss
            + cfg.obs_loss_weight * obs_loss
            + entropy_weight * (-entropy)
        )
        if dc_w > 0:
            loss = loss + dc_w * drift_loss
        extra = alpha_loss + recon_w * latent_recon_loss
        latent_norm_max = jnp.max(jnp.linalg.norm(out["obs_embeddings"], axis=-1))
        # encoder-collapse telemetry (round-5: v6's encoder collapsed to a
        # CONSTANT embedding — obs_loss 1e-4, all states identical; this
        # std is ~0 iff collapsed)
        emb_flat_all = out["obs_embeddings"].reshape(-1, out["obs_embeddings"].shape[-1])
        latent_batch_std = jnp.mean(jnp.std(emb_flat_all, axis=0))
        logs = dict(
            policy_loss=jnp.mean(policy_loss),
            value_loss=jnp.mean(value_loss),
            reward_loss=jnp.mean(reward_loss),
            obs_loss=jnp.mean(obs_loss),
            latent_recon_loss=latent_recon_loss,
            dc_reward_loss=dc_reward_loss,
            alpha_loss=alpha_loss,
            entropy_weight=entropy_weight,
            latent_norm_max=latent_norm_max,
            latent_batch_std=latent_batch_std,
            # per-head max |logits| for Head-Clip (reference
            # head_clip_manager.py:184-260 monitors these)
            policy_logits_max=jnp.max(jnp.abs(out["policy_logits"])),
            value_logits_max=jnp.max(jnp.abs(out["value_logits"])),
            reward_logits_max=jnp.max(jnp.abs(out["reward_logits"])),
            policy_entropy=jnp.mean(entropy),
            predicted_value=jnp.mean(pred_value0),
            target_value=jnp.mean(batch.target_value[:, 0]),
        )
        return loss, extra, logs, value_priority

    def _loss_fn(self, params, batch: TrainBatch, train_iter=None):
        loss, extra, logs, value_priority = self._sample_losses(
            params, batch, train_iter=train_iter
        )
        weighted_total_loss = jnp.mean(batch.weights * loss) + extra
        logs["total_loss"] = weighted_total_loss
        return weighted_total_loss / self.num_unroll_steps, (logs, value_priority)

    def _forward_learn(self, state, batch: TrainBatch):
        """UniZero learn step: gradient accumulation over micro-batches,
        non-finite-loss guard (reference NaN/Inf asserts, unizero.py:1027),
        log_alpha clamp to [log 5e-2, log 10] (unizero.py:1060), and
        Encoder-Clip weight rescaling (unizero.py:1106-1137)."""
        import optax

        from lightzero_tpu.policy.muzero import TrainState

        cfg = self.cfg
        steps = int(cfg.get("accumulation_steps", 1))
        grad_fn = jax.value_and_grad(self._loss_fn, has_aux=True)
        if steps <= 1:
            (_, (logs, value_priority)), grads = grad_fn(
                state.params, batch, state.train_iter
            )
        else:
            B = batch.obs.shape[0]
            micro = B // steps
            batch_m = jax.tree_util.tree_map(
                lambda x: x.reshape((steps, micro) + x.shape[1:]), batch
            )

            def acc(carry, mb):
                (_, (lg, vp)), g = grad_fn(state.params, mb, state.train_iter)
                gsum = jax.tree_util.tree_map(jnp.add, carry, g)
                return gsum, (lg, vp)

            zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            gsum, (logs_m, vp_m) = jax.lax.scan(acc, zero, batch_m)
            grads = jax.tree_util.tree_map(lambda g: g / steps, gsum)
            logs = jax.tree_util.tree_map(jnp.mean, logs_m)
            value_priority = vp_m.reshape(B)

        # non-finite guard (reference NaN/Inf asserts, unizero.py:1027): on a
        # bad batch the ENTIRE update is skipped — weight decay would still
        # move params under merely-zeroed gradients
        finite = jnp.isfinite(logs["total_loss"]) & jnp.all(
            jnp.asarray([jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)])
        )
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        logs["nonfinite_loss"] = (~finite).astype(jnp.float32)

        updates, opt_state = self.optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old), params, state.params
        )
        opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old), opt_state, state.opt_state
        )

        if bool(cfg.get("use_adaptive_entropy_weight", False)):
            p = dict(params["params"])
            p["log_alpha"] = jnp.clip(p["log_alpha"], jnp.log(5e-2), jnp.log(10.0))
            params = {**params, "params": p}

        if bool(cfg.get("use_encoder_clip_annealing", False)):
            it = state.train_iter.astype(jnp.float32)
            progress = jnp.minimum(1.0, it / float(cfg.encoder_clip_anneal_steps))
            if str(cfg.get("encoder_clip_anneal_type", "cosine")) == "cosine":
                cosw = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
                clip_v = float(cfg.encoder_clip_end) + (
                    float(cfg.encoder_clip_start) - float(cfg.encoder_clip_end)
                ) * cosw
            else:
                clip_v = (
                    float(cfg.encoder_clip_start) * (1.0 - progress)
                    + float(cfg.encoder_clip_end) * progress
                )
            scale = jnp.minimum(1.0, clip_v / jnp.maximum(logs["latent_norm_max"], 1e-9))
            p = dict(params["params"])
            for enc_key in ("_enc", "_enc_conv", "_enc_proj"):
                if enc_key in p:
                    p[enc_key] = jax.tree_util.tree_map(lambda w: w * scale, p[enc_key])
            params = {**params, "params": p}
            logs["encoder_clip_scale"] = scale

        # Head-Clip (reference head_clip_manager.py): when a prediction
        # head's max |logits| exceeds an annealed threshold, rescale that
        # head's weights by threshold/max — prevents logit explosion in
        # long runs without touching the shared trunk.
        if bool(cfg.get("use_head_clip", False)):
            it = state.train_iter.astype(jnp.float32)
            progress = jnp.minimum(1.0, it / float(cfg.head_clip_anneal_steps))
            if str(cfg.get("head_clip_anneal_type", "cosine")) == "cosine":
                cosw = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
                thr = float(cfg.head_clip_end) + (
                    float(cfg.head_clip_start) - float(cfg.head_clip_end)
                ) * cosw
            else:
                thr = (float(cfg.head_clip_start) * (1.0 - progress)
                       + float(cfg.head_clip_end) * progress)
            p = dict(params["params"])
            for head_key, log_key in (
                ("_policy_head", "policy_logits_max"),
                ("_value_head", "value_logits_max"),
                ("_reward_head", "reward_logits_max"),
            ):
                if head_key in p:
                    hscale = jnp.minimum(1.0, thr / jnp.maximum(logs[log_key], 1e-9))
                    p[head_key] = jax.tree_util.tree_map(lambda w: w * hscale, p[head_key])
                    logs[f"head_clip_scale/{head_key}"] = hscale
            params = {**params, "params": p}

        train_iter = state.train_iter + 1
        target_params = optax.periodic_update(
            params, state.target_params, train_iter, self.cfg.target_update_freq
        )
        logs["grad_norm"] = optax.global_norm(grads)
        logs["cur_lr"] = (
            self._lr_schedule()(state.train_iter)
            if callable(self._lr_schedule())
            else jnp.asarray(self.cfg.learning_rate)
        )
        return TrainState(params, target_params, opt_state, train_iter), logs, value_priority

    def _bootstrap_value_fn(self, target_params, obs):
        """Single-obs value: fresh cache + one obs token."""
        B = obs.shape[0]
        cache = self._fresh_cache(B)
        obs_e = self.model.apply(target_params, obs, method=UniZeroModel.encode_obs)
        o_out, _ = self.model.apply(
            target_params, cache, obs_e, self._task_ids(B),
            method=UniZeroModel.infer_obs_step,
        )
        return inverse_scalar_transform(o_out["value_logits"], self.value_support)

    def _forward_reanalyze(self, target_params, rng, obs, legal_mask, to_play,
                           obs_hist=None, act_hist=None, hist_len=None):
        """Reanalyze with the TRUE (obs, action) history threaded into the
        root's KV cache (the reference threads batch_action through per-env
        caches, game_buffer_unizero.py:400,544) — ``prefill`` teacher-forces
        the interleaved history so the root sees the same context the model
        saw at collect time. Falls back to a fresh single-obs context when
        no history is supplied."""
        if obs_hist is not None:
            o_out, cache = self.model.apply(
                target_params, obs_hist, act_hist, hist_len,
                self._task_ids(obs.shape[0]), method=UniZeroModel.prefill,
            )
        else:
            B = obs.shape[0]
            cache = self._fresh_cache(B)
            obs_e = self.model.apply(target_params, obs, method=UniZeroModel.encode_obs)
            o_out, cache = self.model.apply(
                target_params, cache, obs_e, self._task_ids(B),
                method=UniZeroModel.infer_obs_step,
            )
        root = RootOutput(
            prior_logits=o_out["policy_logits"],
            value=inverse_scalar_transform(o_out["value_logits"], self.value_support),
            embedding=dict(cache=cache),
        )
        search_out = batch_puct_search(
            target_params,
            rng,
            root,
            self._recurrent_fn,
            self.search_cfg,
            legal_mask,
            to_play=to_play,
            with_noise=bool(self.cfg.get("reanalyze_noise", True)),
        )
        counts = search_out.visit_counts.astype(jnp.float32)
        return counts / jnp.maximum(counts.sum(-1, keepdims=True), 1e-9), search_out.root_value

    def forward_reanalyze(self, target_params, rng, obs, legal_mask, to_play=None,
                          obs_hist=None, act_hist=None, hist_len=None, **_ignored):
        if not hasattr(self, "_jit_reanalyze"):
            self._jit_reanalyze = jax.jit(self._forward_reanalyze)
        B = obs.shape[0]
        if to_play is None:
            to_play = jnp.full((B,), -1, jnp.int32)
        return self._jit_reanalyze(
            target_params, rng, obs, legal_mask, to_play, obs_hist, act_hist, hist_len
        )
