"""MuZero policy: jitted learn / collect / eval paths.

Capability-parity rebuild of reference lzero/policy/muzero.py:
- ``forward_learn`` = _forward_learn (:361-672): unroll-K losses (value CE +
  policy CE + reward CE + optional SSL cosine consistency + policy-entropy
  reg), IS-weighted, total gradient scaled 1/K, grad-norm clip, periodic
  assign target-network update (:301-307), value_priority = |v̂₀ − z₀|.
- ``forward_collect`` = _forward_collect (:690-814): initial_inference →
  batched in-jit MCTS with Dirichlet noise → temperature visit sampling
  (+ optional epsilon-greedy).
- ``forward_eval`` = _forward_eval (:857): no noise, deterministic argmax.

TPU-first design: the whole sample→loss→update step is ONE jitted function
over a pytree TrainState; collect/eval fuse network inference and search in
a single XLA program (no per-simulation host round trips).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from lightzero_tpu.config import Config
from lightzero_tpu.models import MuZeroModel
from lightzero_tpu.ops import (
    DiscreteSupport,
    cross_entropy_loss,
    inverse_scalar_transform,
    phi_transform,
    scalar_transform,
)
from lightzero_tpu.ops.action import sample_from_visit_counts
from lightzero_tpu.search import (
    RecurrentOutput,
    RootOutput,
    SearchConfig,
    batch_puct_search,
)
from lightzero_tpu.utils import POLICY_REGISTRY


class TrainState(NamedTuple):
    params: Any
    target_params: Any
    opt_state: Any
    train_iter: jnp.ndarray  # scalar int32


class TrainBatch(NamedTuple):
    """One training batch (assembled by the game buffer).

    obs: (B, K+1, *obs_shape) frame-stacked observations at unroll steps
    actions: (B, K) int32
    mask: (B, K) 1.0 while unroll step k is inside the trajectory
    target_reward: (B, K) scalar rewards (transition k)
    target_value: (B, K+1) scalar n-step value targets
    target_policy: (B, K+1, A) visit-count distributions (zeros when masked)
    weights: (B,) IS correction weights
    """

    obs: jnp.ndarray
    actions: jnp.ndarray
    mask: jnp.ndarray
    target_reward: jnp.ndarray
    target_value: jnp.ndarray
    target_policy: jnp.ndarray
    weights: jnp.ndarray
    # (B, K) true chance codes (stochastic envs); None elsewhere
    chance: Optional[jnp.ndarray] = None


def negative_cosine_similarity(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-9)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-9)
    return -jnp.sum(a * b, axis=-1)


@POLICY_REGISTRY.register("muzero")
class MuZeroPolicy:
    """Holds the model + jitted pure functions. All state lives in
    ``TrainState`` pytrees owned by the caller."""

    # static per-worker task id (multitask collect/eval/reanalyze condition
    # the model's task embedding; policy/multitask.py task_view binds this
    # per task — reference task_id-kwarg plumbing, unizero_multitask.py)
    _collect_task_id: Optional[int] = None

    def _task_ids(self, batch_size: int):
        """(B,) task-id array for model conditioning, or None outside
        multitask runs."""
        if self._collect_task_id is None:
            return None
        return jnp.full((batch_size,), int(self._collect_task_id), jnp.int32)

    @staticmethod
    def default_config() -> Config:
        """Key hyperparameters, reference defaults (muzero.py:37-237)."""
        return Config(
            dict(
                type="muzero",
                model=dict(
                    observation_shape=4,
                    action_space_size=2,
                    model_type="mlp",
                    latent_state_dim=256,
                    support_scale=300,
                    categorical_distribution=True,
                    self_supervised_learning_loss=False,
                    norm_type="LN",
                    # HarmonyDream learnable loss weights (muzero.py:325-331)
                    harmony_balance=False,
                ),
                batch_size=256,
                optim_type="Adam",  # 'SGD' | 'Adam' | 'AdamW'
                learning_rate=0.003,
                momentum=0.9,
                weight_decay=1e-4,
                grad_clip_value=10.0,
                piecewise_decay_lr_scheduler=False,
                threshold_training_steps_for_final_lr=int(5e4),
                num_unroll_steps=5,
                td_steps=5,
                discount_factor=0.997,
                num_simulations=50,
                root_dirichlet_alpha=0.3,
                root_noise_weight=0.25,
                pb_c_base=19652,
                pb_c_init=1.25,
                value_delta_max=0.01,
                ssl_loss_weight=0.0,
                policy_loss_weight=1.0,
                value_loss_weight=0.25,
                reward_loss_weight=1.0,
                policy_entropy_weight=0.0,
                target_update_freq=100,
                use_priority=True,
                priority_prob_alpha=0.6,
                priority_prob_beta=0.4,
                env_type="not_board_games",
                battle_mode="play_with_bot_mode",
                eval_freq=100,
                replay_ratio=0.25,
                n_episode=8,
                game_segment_length=200,
                replay_buffer_size=int(1e6),
                collect_epsilon=0.0,
                manual_temperature_decay=False,
                # reference default (muzero.py:194): 0.25 sharpens the
                # visit-count collect distribution (counts^4) — at 1.0 the
                # flat 50-sim visit profile collapses to near-uniform
                # exploration and the policy-improvement operator stalls
                # (diagnosed on Pendulum Sampled-EZ).
                fixed_temperature_value=0.25,
                threshold_training_steps_for_final_temperature=int(1e5),
                reanalyze_ratio=0.0,
                reanalyze_noise=True,
                # no-search collect mode (reference muzero.py:800-812)
                collect_with_pure_policy=False,
                # ReZero (arXiv:2404.16364): periodic backward-order buffer
                # reanalyze with root-value reuse (train_rezero.py:49-53;
                # search_with_reuse, mcts_ctree.py:368-465)
                reuse_search=False,
            )
        )

    def __init__(self, cfg: Config, model: Optional[MuZeroModel] = None):
        self.cfg = cfg
        scale = cfg.model.get("support_scale", 300)
        self.value_support = DiscreteSupport(-float(scale), float(scale) + 1.0, 1.0)
        self.reward_support = DiscreteSupport(-float(scale), float(scale) + 1.0, 1.0)
        model_cfg = Config(dict(cfg.model))
        model_cfg.value_support_size = self.value_support.size
        model_cfg.reward_support_size = self.reward_support.size
        self.model = model or MuZeroModel.from_config(model_cfg)
        self.num_unroll_steps = cfg.num_unroll_steps
        self.players = 2 if cfg.env_type == "board_games" else 1
        self.search_cfg = SearchConfig(
            num_simulations=cfg.num_simulations,
            pb_c_base=float(cfg.pb_c_base),
            pb_c_init=float(cfg.pb_c_init),
            discount=float(cfg.discount_factor),
            value_delta_max=float(cfg.value_delta_max),
            root_dirichlet_alpha=float(cfg.root_dirichlet_alpha),
            root_noise_weight=float(cfg.root_noise_weight),
            players=self.players,
            use_pallas_traverse=bool(cfg.get("use_pallas_traverse", False)),
        )
        self.optimizer = self._make_optimizer()
        # jitted entry points
        self._jit_learn = jax.jit(self._forward_learn, donate_argnums=(0,))
        self._jit_collect = jax.jit(self._forward_collect, static_argnames=("deterministic",))

    # ------------------------------------------------------------------ init
    def _lr_schedule(self):
        cfg = self.cfg
        if cfg.get("cos_lr_scheduler", False):
            # reference cos_lr_scheduler (pendulum SEZ config)
            return optax.cosine_decay_schedule(
                float(cfg.learning_rate),
                int(cfg.get("cos_lr_decay_steps", 1e5)),
                alpha=0.05,
            )
        if cfg.piecewise_decay_lr_scheduler:
            t = int(cfg.threshold_training_steps_for_final_lr)
            return optax.piecewise_constant_schedule(
                float(cfg.learning_rate), {int(0.5 * t): 0.1, int(0.75 * t): 0.1}
            )
        return float(cfg.learning_rate)

    def _make_optimizer(self):
        cfg = self.cfg
        lr = self._lr_schedule()
        if cfg.optim_type == "SGD":
            opt = optax.chain(
                optax.add_decayed_weights(float(cfg.weight_decay)),
                optax.sgd(lr, momentum=float(cfg.momentum)),
            )
        elif cfg.optim_type == "Adam":
            # torch.optim.Adam applies weight_decay as L2 added to the
            # gradient BEFORE the moment updates (reference muzero.py:276-291
            # distinguishes Adam from AdamW's decoupled decay)
            opt = optax.chain(
                optax.add_decayed_weights(float(cfg.weight_decay)),
                optax.adam(lr),
            )
        elif cfg.optim_type == "AdamW":
            # selective decay (reference configure_optimizers_nanogpt,
            # lzero/policy/utils.py:275): decay only rank>=2 kernels, never
            # biases / LayerNorm scales / embeddings
            mask = None
            if bool(cfg.get("selective_weight_decay", False)):
                mask = lambda params: jax.tree_util.tree_map(
                    lambda w: w.ndim >= 2, params
                )
            opt = optax.adamw(lr, weight_decay=float(cfg.weight_decay), mask=mask)
        else:
            raise ValueError(f"unknown optim_type {cfg.optim_type}")
        return optax.chain(optax.clip_by_global_norm(float(cfg.grad_clip_value)), opt)

    def init_train_state(self, rng: jax.Array) -> TrainState:
        params = self.model.init_params(rng)
        return TrainState(
            params=params,
            # distinct buffers: the learn step donates the whole state, and
            # XLA rejects donating aliased params/target_params twice
            target_params=jax.tree_util.tree_map(jnp.copy, params),
            opt_state=self.optimizer.init(params),
            train_iter=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------ inference
    def _initial(self, params, obs, task_id=None):
        if task_id is None:
            task_id = self._task_ids(obs.shape[0])
        return self.model.apply(
            params, obs, task_id, method=MuZeroModel.initial_inference
        )

    def _bootstrap_value_fn(self, target_params, obs):
        """Fresh target-net root value for buffer bootstrap targets."""
        out = self._initial(target_params, obs)
        return inverse_scalar_transform(out.value_logits, self.value_support)

    def _root_embedding(self, out0):
        """Search-embedding pytree at the root; variants (EfficientZero)
        extend this with LSTM state etc."""
        return out0.latent_state

    def _recurrent_fn(self, params, rng, action, embedding) -> RecurrentOutput:
        out = self.model.apply(params, embedding, action, method=MuZeroModel.recurrent_inference)
        return RecurrentOutput(
            reward=inverse_scalar_transform(out.reward_logits, self.reward_support),
            value=inverse_scalar_transform(out.value_logits, self.value_support),
            prior_logits=out.policy_logits,
            embedding=out.latent_state,
        )

    # ---------------------------------------------------------------- learn
    def _sample_losses(self, params, batch: TrainBatch, task_id=None, train_iter=None):
        """Per-sample loss vector BEFORE importance weighting/reduction.

        Returns ``(loss_vec (B,), extra_scalar, logs, value_priority)``;
        ``_loss_fn`` reduces with the IS weights, the multitask policies
        (policy/multitask.py) reduce per task instead (reference per-task
        loss lists, lzero/policy/unizero_multitask.py). ``task_id`` (B,)
        conditions the root latent when the model has a task embedding
        (num_tasks > 0, the muzero_model_multitask role)."""
        cfg = self.cfg
        K = self.num_unroll_steps
        h = scalar_transform
        tv_cat = phi_transform(self.value_support, h(batch.target_value))  # (B,K+1,S)
        tr_cat = phi_transform(self.reward_support, h(batch.target_reward))  # (B,K,S)

        out0 = self._initial(params, batch.obs[:, 0], task_id)
        value_logits, policy_logits, latent = (
            out0.value_logits,
            out0.policy_logits,
            out0.latent_state,
        )
        value_loss = cross_entropy_loss(value_logits, tv_cat[:, 0])
        policy_loss = cross_entropy_loss(policy_logits, batch.target_policy[:, 0])
        prob = jax.nn.softmax(policy_logits, axis=-1)
        entropy = -jnp.sum(prob * jnp.log(jnp.maximum(prob, 1e-9)), axis=-1)
        policy_entropy_loss = -entropy
        pred_value0 = inverse_scalar_transform(value_logits, self.value_support)
        value_priority = jnp.abs(pred_value0 - batch.target_value[:, 0])

        reward_loss = jnp.zeros_like(value_loss)
        consistency_loss = jnp.zeros_like(value_loss)
        ssl = cfg.model.get("self_supervised_learning_loss", False) and cfg.ssl_loss_weight > 0

        for k in range(K):
            rec = self.model.apply(
                params, latent, batch.actions[:, k], method=MuZeroModel.recurrent_inference
            )
            latent = rec.latent_state
            if ssl:
                repr_k = self.model.apply(
                    params, batch.obs[:, k + 1], task_id,
                    method=MuZeroModel.representation,
                )
                proj_dyn = self.model.apply(params, latent, True, method=MuZeroModel.project)
                proj_obs = self.model.apply(
                    params, jax.lax.stop_gradient(repr_k), False, method=MuZeroModel.project
                )
                proj_obs = jax.lax.stop_gradient(proj_obs)
                consistency_loss = consistency_loss + negative_cosine_similarity(
                    proj_dyn, proj_obs
                ) * batch.mask[:, k]
            policy_loss = policy_loss + cross_entropy_loss(
                rec.policy_logits, batch.target_policy[:, k + 1]
            )
            prob = jax.nn.softmax(rec.policy_logits, axis=-1)
            entropy = -jnp.sum(prob * jnp.log(jnp.maximum(prob, 1e-9)), axis=-1)
            policy_entropy_loss = policy_entropy_loss - entropy
            value_loss = value_loss + cross_entropy_loss(rec.value_logits, tv_cat[:, k + 1])
            reward_loss = reward_loss + cross_entropy_loss(rec.reward_logits, tr_cat[:, k])

        if cfg.model.get("harmony_balance", False):
            # HarmonyDream learnable loss weights (reference muzero.py:563-575):
            # each loss divided by exp(h_i) + log(exp(h_i)+1) regularizer
            p = params["params"]
            h_p, h_v, h_r = p["harmony_policy"], p["harmony_value"], p["harmony_reward"]
            loss = (
                cfg.ssl_loss_weight * consistency_loss
                + policy_loss / jnp.exp(h_p)
                + value_loss / jnp.exp(h_v)
                + reward_loss / jnp.exp(h_r)
            )
            extra = (
                jnp.log(jnp.exp(h_p) + 1.0)
                + jnp.log(jnp.exp(h_v) + 1.0)
                + jnp.log(jnp.exp(h_r) + 1.0)
            )
        else:
            loss = (
                cfg.ssl_loss_weight * consistency_loss
                + cfg.policy_loss_weight * policy_loss
                + cfg.value_loss_weight * value_loss
                + cfg.reward_loss_weight * reward_loss
                + cfg.policy_entropy_weight * policy_entropy_loss
            )
            extra = jnp.zeros(())
        logs = dict(
            policy_loss=jnp.mean(policy_loss),
            value_loss=jnp.mean(value_loss),
            reward_loss=jnp.mean(reward_loss),
            consistency_loss=jnp.mean(consistency_loss),
            policy_entropy=jnp.mean(entropy),
            predicted_value=jnp.mean(pred_value0),
            target_value=jnp.mean(batch.target_value[:, 0]),
        )
        return loss, extra, logs, value_priority

    def _loss_fn(self, params, batch: TrainBatch):
        loss, extra, logs, value_priority = self._sample_losses(params, batch)
        weighted_total_loss = jnp.mean(batch.weights * loss) + extra
        logs["total_loss"] = weighted_total_loss
        # total-gradient rescale 1/K (reference muzero.py:584-585)
        return weighted_total_loss / self.num_unroll_steps, (logs, value_priority)

    def _forward_learn(self, state: TrainState, batch: TrainBatch):
        (_, (logs, value_priority)), grads = jax.value_and_grad(self._loss_fn, has_aux=True)(
            state.params, batch
        )
        updates, opt_state = self.optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
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
        return (
            TrainState(params, target_params, opt_state, train_iter),
            logs,
            value_priority,
        )

    def forward_learn(self, state: TrainState, batch: TrainBatch):
        state, logs, priority = self._jit_learn(state, batch)
        return state, logs, priority

    # -------------------------------------------------------------- collect
    def _forward_collect(
        self,
        params,
        rng: jax.Array,
        obs: jnp.ndarray,
        legal_mask: jnp.ndarray,
        to_play: jnp.ndarray,
        temperature: jnp.ndarray,
        epsilon: jnp.ndarray,
        deterministic: bool = False,
    ):
        out0 = self._initial(params, obs)
        pred_value = inverse_scalar_transform(out0.value_logits, self.value_support)
        if bool(self.cfg.get("collect_with_pure_policy", False)):
            # no-search mode (reference muzero.py:800-812): sample directly
            # from the softmax policy over legal actions
            rng, a_rng = jax.random.split(rng)
            masked = jnp.where(legal_mask, out0.policy_logits, -jnp.inf)
            probs = jax.nn.softmax(masked, axis=-1)
            actions = jax.random.categorical(a_rng, masked, axis=-1).astype(jnp.int32)
            if deterministic:
                actions = jnp.argmax(masked, axis=-1).astype(jnp.int32)
            entropy = -jnp.sum(probs * jnp.log(jnp.maximum(probs, 1e-9)), axis=-1)
            return dict(
                action=actions,
                visit_counts=probs,
                searched_value=pred_value,
                predicted_value=pred_value,
                policy_logits=out0.policy_logits,
                distribution_entropy=entropy,
            )
        root = RootOutput(
            prior_logits=out0.policy_logits, value=pred_value, embedding=self._root_embedding(out0)
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
        # epsilon-greedy over legal actions (collect_epsilon, muzero.py:772)
        B, A = legal_mask.shape
        rand_action = jax.random.categorical(
            u_rng, jnp.where(legal_mask, 0.0, -jnp.inf), axis=-1
        )
        explore = jax.random.uniform(e_rng, (B,)) < epsilon
        actions = jnp.where(explore & ~jnp.asarray(deterministic), rand_action, actions)
        return dict(
            action=actions,
            visit_counts=search_out.visit_counts,
            searched_value=search_out.root_value,
            predicted_value=pred_value,
            policy_logits=out0.policy_logits,
            distribution_entropy=dist_entropy,
        )

    def forward_collect(
        self, params, rng, obs, legal_mask, to_play=None, temperature=1.0, epsilon=0.0
    ) -> Dict[str, jnp.ndarray]:
        B = obs.shape[0]
        if to_play is None:
            to_play = jnp.full((B,), -1, jnp.int32)
        return self._jit_collect(
            params,
            rng,
            obs,
            legal_mask,
            to_play,
            jnp.asarray(temperature, jnp.float32),
            jnp.asarray(epsilon, jnp.float32),
            deterministic=False,
        )

    def _forward_reanalyze(
        self, target_params, rng, obs, legal_mask, to_play, true_action=None, reuse_value=None
    ):
        """Re-run the search with the target network on stored observations
        and return fresh normalized visit distributions — the reanalyzed
        policy targets (reference _compute_target_policy_reanalyzed,
        game_buffer_muzero.py:578-731; noise per ``reanalyze_noise``,
        muzero.py:197-198). ``true_action``/``reuse_value`` select the ReZero
        reuse-search (MCTSCtree.search_with_reuse, mcts_ctree.py:368-465)."""
        out0 = self._initial(target_params, obs)
        root = RootOutput(
            prior_logits=out0.policy_logits,
            value=inverse_scalar_transform(out0.value_logits, self.value_support),
            embedding=self._root_embedding(out0),
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
            true_action=true_action,
            reuse_value=reuse_value,
        )
        counts = search_out.visit_counts.astype(jnp.float32)
        return counts / jnp.maximum(counts.sum(-1, keepdims=True), 1e-9), search_out.root_value

    def forward_reanalyze(
        self, target_params, rng, obs, legal_mask, to_play=None, true_action=None, reuse_value=None
    ):
        if not hasattr(self, "_jit_reanalyze"):
            self._jit_reanalyze = jax.jit(self._forward_reanalyze)
        B = obs.shape[0]
        if to_play is None:
            to_play = jnp.full((B,), -1, jnp.int32)
        return self._jit_reanalyze(
            target_params, rng, obs, legal_mask, to_play, true_action, reuse_value
        )

    def forward_eval(self, params, rng, obs, legal_mask, to_play=None) -> Dict[str, jnp.ndarray]:
        B = obs.shape[0]
        if to_play is None:
            to_play = jnp.full((B,), -1, jnp.int32)
        return self._jit_collect(
            params,
            rng,
            obs,
            legal_mask,
            to_play,
            jnp.asarray(1.0, jnp.float32),
            jnp.asarray(0.0, jnp.float32),
            deterministic=True,
        )
