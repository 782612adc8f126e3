"""Multitask policies (ScaleZero parity).

Registered types ``muzero_multitask`` / ``unizero_multitask`` /
``sampled_unizero_multitask`` — capability-parity rebuilds of reference
lzero/policy/{muzero_multitask,unizero_multitask,sampled_unizero_multitask}.py:
ONE shared model trained across tasks, per-task losses aggregated with task
weights, optional gradient-conflict correction.

TPU-native redesign: the reference loops over per-task batches in Python
and sums ``loss_total * task_weight`` per task (sampled_unizero_multitask
.py:388-455), with MoCo (LibMTL) momentum gradient correction (:340-351,
480-483). Here all tasks share ONE combined batch with a per-sample
``task_id`` row; the per-task aggregation is a one-hot segment-mean INSIDE
the jitted loss, so the whole multitask update stays a single XLA program
and shards over the 'dp' mesh axis unchanged. Gradient correction is
CAGrad (conflict-averse gradient descent, arXiv:2110.14048 — the stateless
member of the MoCo/CAGrad family the reference draws from): per-task
gradients via one ``jax.jacrev``, the convex combination solved on-device
from the T×T Gram matrix.

Task-conditioned inference: the UniZero world model takes a per-sample
``task_id`` (task embedding added to every token, transformer.py here;
reference register_task_embed, world_model_multitask.py). Collect/eval
workers bind a static task id via :meth:`MultitaskMixin.task_view`.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from lightzero_tpu.config import Config
from lightzero_tpu.policy.muzero import MuZeroPolicy, TrainBatch, TrainState
from lightzero_tpu.policy.sampled_unizero import SampledUniZeroPolicy
from lightzero_tpu.policy.unizero import UniZeroPolicy
from lightzero_tpu.utils import POLICY_REGISTRY


class MTTrainBatch(NamedTuple):
    """TrainBatch + multitask fields. Duck-types TrainBatch so every base
    ``_sample_losses`` consumes it unchanged.

    task_id: (B,) int32 — task index per sample
    task_weights: (T,) float32 — cross-task loss weights (symlog distance
        weighting computed by the entry; reference compute_task_weights,
        lzero/entry/utils.py:195)
    """

    obs: jnp.ndarray
    actions: jnp.ndarray
    mask: jnp.ndarray
    target_reward: jnp.ndarray
    target_value: jnp.ndarray
    target_policy: jnp.ndarray
    weights: jnp.ndarray
    chance: Optional[jnp.ndarray] = None
    task_id: Optional[jnp.ndarray] = None
    task_weights: Optional[jnp.ndarray] = None


def attach_task_fields(batch, task_id, task_weights):
    """Wrap a (Sampled)TrainBatch with multitask fields. For wrapper
    batches carrying a ``.base`` TrainBatch (SampledTrainBatch), the MT
    fields attach to the inner base."""
    task_id = jnp.asarray(task_id, jnp.int32)
    task_weights = jnp.asarray(task_weights, jnp.float32)
    if hasattr(batch, "base"):
        return batch._replace(
            base=attach_task_fields(batch.base, task_id, task_weights)
        )
    return MTTrainBatch(*batch, task_id=task_id, task_weights=task_weights)


def _mt_fields(batch):
    """(task_id, task_weights, weights) regardless of wrapper nesting."""
    tb = batch.base if hasattr(batch, "base") else batch
    return tb.task_id, tb.task_weights, tb.weights


def task_loss_vector(loss_vec, weights, task_id, num_tasks):
    """Per-task mean of the IS-weighted per-sample losses: (T,) with zeros
    for absent tasks, plus the per-task sample counts (T,)."""
    wl = weights * loss_vec
    onehot = jax.nn.one_hot(task_id, num_tasks, dtype=wl.dtype)  # (B, T)
    n = onehot.sum(axis=0)  # (T,)
    return (onehot * wl[:, None]).sum(axis=0) / jnp.maximum(n, 1.0), n


def cagrad_combine(task_grads, c: float = 0.4, gd_steps: int = 25):
    """Conflict-averse combination of per-task gradients (CAGrad,
    arXiv:2110.14048) — the stateless equivalent of the reference's MoCo
    correction (sampled_unizero_multitask.py:340-351).

    ``task_grads``: pytree whose leaves have leading dim T (from jacrev of a
    (T,)-loss vector). Everything reduces through the T×T Gram matrix, so
    the simplex solve is tiny algebra on-device:
      min_{w∈Δ} g_wᵀ g₀ + c·‖g₀‖·‖g_w‖,  g₀ = mean_t g_t, g_w = Σ w_t g_t
    solved by projected gradient (softmax parameterization); the combined
    update is g₀ + (c·‖g₀‖/‖g_w‖)·g_w = Σ_t (1/T + λ w_t) g_t.
    """
    leaves = jax.tree_util.tree_leaves(task_grads)
    T = leaves[0].shape[0]
    G = jnp.concatenate([l.reshape(T, -1) for l in leaves], axis=1)  # (T, d)
    M = G @ G.T  # (T, T) Gram
    ones = jnp.ones((T,)) / T
    g0_norm = jnp.sqrt(jnp.maximum(ones @ M @ ones, 1e-12))

    def objective(z):
        w = jax.nn.softmax(z)
        gw_norm = jnp.sqrt(jnp.maximum(w @ M @ w, 1e-12))
        return w @ M @ ones + c * g0_norm * gw_norm

    def gd(i, z):
        return z - 0.5 * jax.grad(objective)(z)

    z = jax.lax.fori_loop(0, gd_steps, gd, jnp.zeros((T,)))
    w = jax.nn.softmax(z)
    gw_norm = jnp.sqrt(jnp.maximum(w @ M @ w, 1e-12))
    lam = c * g0_norm / gw_norm
    alpha = ones + lam * w  # (T,) combination coefficients
    combined = jax.tree_util.tree_map(
        lambda l: jnp.tensordot(alpha, l, axes=1), task_grads
    )
    return combined, w


class MultitaskMixin:
    """Mixed into a base policy AHEAD of it in the MRO. Requires the base
    to expose ``_sample_losses(params, batch, task_id, train_iter)``."""

    @classmethod
    def _mt_default_config(cls, base_cfg: Config, type_name: str) -> Config:
        base_cfg.type = type_name
        base_cfg.task_num = 2
        # 'none' = weighted per-task means (the reference's default
        # task-weight path); 'cagrad' = conflict-averse per-task gradient
        # combination (MoCo/CAGrad family, sampled_unizero_multitask.py:340)
        base_cfg.grad_correction = "none"
        base_cfg.cagrad_c = 0.4
        return base_cfg

    def __init__(self, cfg: Config, model=None):
        self.task_num = int(cfg.get("task_num", 2))
        self.grad_correction = str(cfg.get("grad_correction", "none"))
        super().__init__(cfg, model=model)

    # ---------------------------------------------------------------- learn
    def _loss_fn(self, params, batch, train_iter=None):
        """Per-task aggregation with task weights inside the jitted step
        (reference weighted_total_loss += loss_total * task_weight,
        sampled_unizero_multitask.py:451-453)."""
        task_id, task_weights, weights = _mt_fields(batch)
        loss_vec, extra, logs, vp = self._sample_losses(
            params, batch, task_id=task_id, train_iter=train_iter
        )
        task_loss, n = task_loss_vector(loss_vec, weights, task_id, self.task_num)
        present = (n > 0).astype(task_loss.dtype)
        if task_weights is None:
            task_weights = jnp.ones((self.task_num,), task_loss.dtype)
        total = (task_weights * task_loss * present).sum() / jnp.maximum(
            present.sum(), 1.0
        ) + extra
        logs["total_loss"] = total
        for t in range(self.task_num):
            logs[f"task{t}_loss"] = task_loss[t]
            logs[f"task{t}_weight"] = task_weights[t]
        return total / self.num_unroll_steps, (logs, vp)

    def _forward_learn(self, state: TrainState, batch):
        if self.grad_correction != "cagrad":
            return super()._forward_learn(state, batch)

        import optax

        # CAGrad path: per-task gradients in ONE jacrev over the (T,)
        # weighted task-loss vector, combined conflict-aversely, then the
        # plain clipped-optimizer update (the unizero extras — encoder/head
        # clip, grad accumulation — apply only on the default path).
        task_id, task_weights, weights = _mt_fields(batch)

        def task_losses(p):
            loss_vec, extra, logs, vp = self._sample_losses(
                p, batch, task_id=task_id, train_iter=state.train_iter
            )
            task_loss, n = task_loss_vector(loss_vec, weights, task_id, self.task_num)
            present = (n > 0).astype(task_loss.dtype)
            tw = (
                jnp.ones((self.task_num,), task_loss.dtype)
                if task_weights is None
                else task_weights
            )
            denom = jnp.maximum(present.sum(), 1.0)
            # per-task objectives; extra (global regularizers) spread evenly
            vec = (tw * task_loss * present) / denom + extra / self.task_num
            vec = vec / self.num_unroll_steps
            return vec, (logs, vp, task_loss, tw)

        jac_fn = jax.jacrev(task_losses, has_aux=True)
        task_grads, (logs, vp, task_loss, tw) = jac_fn(state.params)
        grads, cag_w = cagrad_combine(task_grads, float(self.cfg.get("cagrad_c", 0.4)))

        updates, opt_state = self.optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        train_iter = state.train_iter + 1
        target_params = optax.periodic_update(
            params, state.target_params, train_iter, self.cfg.target_update_freq
        )
        logs["total_loss"] = task_loss.sum()
        logs["grad_norm"] = optax.global_norm(grads)
        for t in range(self.task_num):
            logs[f"task{t}_loss"] = task_loss[t]
            logs[f"task{t}_weight"] = tw[t]
            logs[f"task{t}_cagrad_w"] = cag_w[t]
        return TrainState(params, target_params, opt_state, train_iter), logs, vp

    # -------------------------------------------------------------- workers
    def task_view(self, task_id: int):
        """A shallow view of this policy with a STATIC task id bound for
        collect/eval/reanalyze model conditioning (the reference passes
        task_id kwargs through collector/evaluator/buffer plumbing;
        unizero_multitask.py:1498,1718). Parameters and jitted learn step
        are shared with the parent; the view re-specializes only the
        inference closures."""
        import copy

        view = copy.copy(self)
        view._collect_task_id = int(task_id)
        view._jit_collect = jax.jit(
            view._forward_collect, static_argnames=("deterministic",)
        )
        if hasattr(view, "_jit_reanalyze"):
            del view._jit_reanalyze
        return view


@POLICY_REGISTRY.register("muzero_multitask")
class MuZeroMTPolicy(MultitaskMixin, MuZeroPolicy):
    """Reference lzero/policy/muzero_multitask.py + muzero_model_multitask
    .py: shared MuZero trunk with a task embedding added in-band to the
    root latent (models/muzero.py num_tasks), per-task loss aggregation."""

    @staticmethod
    def default_config() -> Config:
        cfg = MultitaskMixin._mt_default_config(
            MuZeroPolicy.default_config(), "muzero_multitask"
        )
        cfg.model.num_tasks = 2  # task-embedding table size; >= task_num
        return cfg

    def __init__(self, cfg: Config, model=None):
        if int(cfg.model.get("num_tasks", 0)) < int(cfg.get("task_num", 2)):
            cfg.model.num_tasks = int(cfg.get("task_num", 2))
        super().__init__(cfg, model=model)


@POLICY_REGISTRY.register("unizero_multitask")
class UniZeroMTPolicy(MultitaskMixin, UniZeroPolicy):
    """Reference lzero/policy/unizero_multitask.py: ONE transformer world
    model across tasks, task-embedding conditioned, per-task CE losses
    aggregated with task weights."""

    @staticmethod
    def default_config() -> Config:
        cfg = MultitaskMixin._mt_default_config(
            UniZeroPolicy.default_config(), "unizero_multitask"
        )
        cfg.model.num_tasks = 2  # task-embedding table size; >= task_num
        return cfg

    def __init__(self, cfg: Config, model=None):
        if int(cfg.model.get("num_tasks", 0)) < int(cfg.get("task_num", 2)):
            cfg.model.num_tasks = int(cfg.get("task_num", 2))
        super().__init__(cfg, model=model)


@POLICY_REGISTRY.register("sampled_unizero_multitask")
class SampledUniZeroMTPolicy(MultitaskMixin, SampledUniZeroPolicy):
    """Reference lzero/policy/sampled_unizero_multitask.py (ScaleZero):
    sampled-action UniZero across tasks — K tanh-Gaussian (continuous) /
    sampled-discrete actions per node, task-conditioned world model,
    per-task loss aggregation + optional CAGrad correction, composed with
    CurriculumLoRA stage switching (set_curriculum_stage from the balance
    entry)."""

    @staticmethod
    def default_config() -> Config:
        cfg = MultitaskMixin._mt_default_config(
            SampledUniZeroPolicy.default_config(), "sampled_unizero_multitask"
        )
        cfg.model.num_tasks = 2
        return cfg

    def __init__(self, cfg: Config, model=None):
        if int(cfg.model.get("num_tasks", 0)) < int(cfg.get("task_num", 2)):
            cfg.model.num_tasks = int(cfg.get("task_num", 2))
        super().__init__(cfg, model=model)
