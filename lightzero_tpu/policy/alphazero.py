"""AlphaZero policy: env-as-simulator MCTS + (policy CE, value MSE) learning.

Capability-parity rebuild of reference lzero/policy/alphazero.py:
- learn on (state, mcts_visit_probs, winner_z): policy CE + value MSE
  (:156-213);
- collect/eval run MCTS where the ENVIRONMENT is the simulator
  (:222-248,422-438). The reference does this with a C++ loop calling
  back into Python env objects per node
  (ctree_alphazero/mcts_alphazero.cpp:33-63, whose own header notes the
  Py↔C++ boundary is the bottleneck); here the env is a pure jittable step
  function, so the search embedding IS the env state and the whole batch of
  independent game trees runs inside one XLA program.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from lightzero_tpu.config import Config
from lightzero_tpu.models.alphazero import AlphaZeroModel
from lightzero_tpu.ops.action import sample_from_visit_counts
from lightzero_tpu.search import (
    RecurrentOutput,
    RootOutput,
    SearchConfig,
    batch_puct_search,
)
from lightzero_tpu.utils import POLICY_REGISTRY


class AZTrainState(NamedTuple):
    params: Any
    opt_state: Any
    train_iter: jnp.ndarray


class AZTrainBatch(NamedTuple):
    obs: jnp.ndarray  # (B, H, W, C)
    target_policy: jnp.ndarray  # (B, A) mcts visit probs
    target_value: jnp.ndarray  # (B,) winner z in {-1, 0, 1} (mover persp.)


@POLICY_REGISTRY.register("alphazero")
class AlphaZeroPolicy:
    @staticmethod
    def default_config() -> Config:
        return Config(
            dict(
                type="alphazero",
                model=dict(
                    observation_shape=(3, 3, 3),
                    action_space_size=9,
                    num_channels=32,
                    num_res_blocks=1,
                ),
                batch_size=256,
                optim_type="Adam",
                learning_rate=0.003,
                weight_decay=1e-4,
                grad_clip_value=10.0,
                momentum=0.9,
                value_weight=1.0,
                num_simulations=25,
                root_dirichlet_alpha=0.3,
                root_noise_weight=0.25,
                pb_c_base=19652,
                pb_c_init=1.25,
                value_delta_max=0.01,
                env_type="board_games",
                battle_mode="self_play_mode",
                eval_freq=100,
                n_episode=8,
                replay_buffer_size=int(1e5),
                manual_temperature_decay=False,
                fixed_temperature_value=1.0,
                threshold_training_steps_for_final_temperature=int(1e5),
                update_per_collect=50,
            )
        )

    def __init__(self, cfg: Config, env, model: Optional[AlphaZeroModel] = None):
        self.cfg = cfg
        self.env = env  # pure JaxEnv with step_single/observation/legal_mask
        self.model = model or AlphaZeroModel.from_config(cfg.model)
        self.search_cfg = SearchConfig(
            num_simulations=cfg.num_simulations,
            pb_c_base=float(cfg.pb_c_base),
            pb_c_init=float(cfg.pb_c_init),
            discount=1.0,
            value_delta_max=float(cfg.value_delta_max),
            root_dirichlet_alpha=float(cfg.root_dirichlet_alpha),
            root_noise_weight=float(cfg.root_noise_weight),
            players=2,
        )
        self.optimizer = self._make_optimizer()
        self._jit_learn = jax.jit(self._forward_learn, donate_argnums=(0,))
        self._jit_collect = jax.jit(self._forward_collect, static_argnames=("deterministic",))

    def _make_optimizer(self):
        cfg = self.cfg
        if cfg.optim_type == "SGD":
            opt = optax.chain(
                optax.add_decayed_weights(float(cfg.weight_decay)),
                optax.sgd(float(cfg.learning_rate), momentum=float(cfg.momentum)),
            )
        else:
            opt = optax.adamw(float(cfg.learning_rate), weight_decay=float(cfg.weight_decay))
        return optax.chain(optax.clip_by_global_norm(float(cfg.grad_clip_value)), opt)

    def init_train_state(self, rng: jax.Array) -> AZTrainState:
        params = self.model.init_params(rng)
        return AZTrainState(params, self.optimizer.init(params), jnp.zeros((), jnp.int32))

    # ------------------------------------------------------------ inference
    def _recurrent_fn(self, params, rng, action, env_state) -> RecurrentOutput:
        """One env move + net eval at the resulting state. Terminal states
        value from the true outcome (perspective of the player to move)."""
        ns = jax.vmap(self.env.step_single)(env_state, action)
        obs = jax.vmap(self.env.observation)(ns)
        policy_logits, value = self.model.apply(params, obs)
        # outcome from the perspective of ns.to_play (the player to move):
        # winner == to_play → +1 (impossible in practice), winner == opponent
        # → -1, draw → 0
        outcome = jnp.where(
            ns.winner == 0,
            0.0,
            jnp.where(ns.winner == ns.to_play, 1.0, -1.0),
        )
        value = jnp.where(ns.done, outcome, value)
        legal = jax.vmap(self.env.legal_mask)(ns)
        return RecurrentOutput(
            reward=jnp.zeros_like(value),
            value=value,
            prior_logits=policy_logits,
            embedding=ns,
            legal_mask=legal,
            terminal=ns.done,
        )

    def _forward_collect(
        self,
        params,
        rng: jax.Array,
        env_state,
        temperature: jnp.ndarray,
        deterministic: bool = False,
    ):
        obs = jax.vmap(self.env.observation)(env_state)
        legal = jax.vmap(self.env.legal_mask)(env_state)
        to_play = env_state.to_play
        policy_logits, value = self.model.apply(params, obs)
        root = RootOutput(prior_logits=policy_logits, value=value, embedding=env_state)
        rng, s_rng, a_rng = jax.random.split(rng, 3)
        out = batch_puct_search(
            params,
            s_rng,
            root,
            self._recurrent_fn,
            self.search_cfg,
            legal,
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

    def forward_collect(self, params, rng, env_state, temperature=1.0) -> Dict:
        return self._jit_collect(
            params, rng, env_state, jnp.asarray(temperature, jnp.float32), deterministic=False
        )

    def forward_eval(self, params, rng, env_state) -> Dict:
        return self._jit_collect(
            params, rng, env_state, jnp.asarray(1.0, jnp.float32), deterministic=True
        )

    # ---------------------------------------------------------------- learn
    def _loss_fn(self, params, batch: AZTrainBatch):
        policy_logits, value = self.model.apply(params, batch.obs)
        log_probs = jax.nn.log_softmax(policy_logits, axis=-1)
        policy_loss = -jnp.sum(batch.target_policy * log_probs, axis=-1).mean()
        value_loss = jnp.mean((value - batch.target_value) ** 2)
        prob = jax.nn.softmax(policy_logits, axis=-1)
        entropy = -jnp.sum(prob * jnp.log(jnp.maximum(prob, 1e-9)), axis=-1).mean()
        total = policy_loss + self.cfg.value_weight * value_loss
        return total, dict(
            total_loss=total,
            policy_loss=policy_loss,
            value_loss=value_loss,
            policy_entropy=entropy,
        )

    def _forward_learn(self, state: AZTrainState, batch: AZTrainBatch):
        (_, logs), grads = jax.value_and_grad(self._loss_fn, has_aux=True)(state.params, batch)
        updates, opt_state = self.optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        logs["grad_norm"] = optax.global_norm(grads)
        return AZTrainState(params, opt_state, state.train_iter + 1), logs

    def forward_learn(self, state: AZTrainState, batch: AZTrainBatch):
        return self._jit_learn(state, batch)
