"""RND (Random Network Distillation) intrinsic reward model.

Capability-parity rebuild of reference
lzero/reward_model/rnd_reward_model.py: a fixed random target network and a
trained predictor; the intrinsic reward is the normalized prediction error,
added to batch rewards with a decaying weight (``estimate``, :75-143,227).
Input is raw obs (or latent states, matching ``input_type``).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from lightzero_tpu.models.common import MLPTorso


class _RNDNet(nn.Module):
    hidden: int = 256
    out: int = 128

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        return MLPTorso(hidden_sizes=(self.hidden, self.hidden), output_size=self.out)(x)


class RNDState(NamedTuple):
    target_params: Any
    predictor_params: Any
    opt_state: Any
    # running normalization of intrinsic rewards (reference RunningMeanStd)
    count: jnp.ndarray
    mean: jnp.ndarray
    m2: jnp.ndarray
    train_iter: jnp.ndarray


class RNDRewardModel:
    def __init__(self, obs_dim: int, learning_rate: float = 3e-4,
                 intrinsic_reward_weight: float = 0.01, weight_decay_steps: int = 100_000):
        self.net = _RNDNet()
        self.obs_dim = obs_dim
        self.weight = intrinsic_reward_weight
        self.weight_decay_steps = weight_decay_steps
        self.optimizer = optax.adam(learning_rate)
        self._jit_train = jax.jit(self._train_step)
        self._jit_estimate = jax.jit(self._estimate)

    def init_state(self, rng: jax.Array) -> RNDState:
        r1, r2 = jax.random.split(rng)
        x = jnp.zeros((1, self.obs_dim))
        tp = self.net.init(r1, x)
        pp = self.net.init(r2, x)
        return RNDState(
            target_params=tp,
            predictor_params=pp,
            opt_state=self.optimizer.init(pp),
            count=jnp.asarray(1e-4),
            mean=jnp.asarray(0.0),
            m2=jnp.asarray(1.0),
            train_iter=jnp.zeros((), jnp.int32),
        )

    def _error(self, state: RNDState, obs: jnp.ndarray) -> jnp.ndarray:
        t = jax.lax.stop_gradient(self.net.apply(state.target_params, obs))
        p = self.net.apply(state.predictor_params, obs)
        return jnp.mean((p - t) ** 2, axis=-1)

    def _train_step(self, state: RNDState, obs: jnp.ndarray):
        def loss_fn(pp):
            t = self.net.apply(state.target_params, obs)
            p = self.net.apply(pp, obs)
            return jnp.mean((p - jax.lax.stop_gradient(t)) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.predictor_params)
        updates, opt_state = self.optimizer.update(grads, state.opt_state)
        pp = optax.apply_updates(state.predictor_params, updates)
        return state._replace(
            predictor_params=pp, opt_state=opt_state, train_iter=state.train_iter + 1
        ), loss

    def train(self, state: RNDState, obs) -> Tuple[RNDState, float]:
        state, loss = self._jit_train(state, jnp.asarray(obs))
        return state, float(loss)

    def _estimate(self, state: RNDState, obs: jnp.ndarray, rewards: jnp.ndarray):
        err = self._error(state, obs)
        # Welford update of running stats
        b_count = err.shape[0]
        b_mean = jnp.mean(err)
        b_var = jnp.var(err)
        delta = b_mean - state.mean
        tot = state.count + b_count
        new_mean = state.mean + delta * b_count / tot
        new_m2 = state.m2 + b_var * b_count + delta**2 * state.count * b_count / tot
        std = jnp.sqrt(jnp.maximum(new_m2 / tot, 1e-8))
        intrinsic = (err - new_mean) / std
        decay = jnp.clip(
            1.0 - state.train_iter.astype(jnp.float32) / self.weight_decay_steps, 0.0, 1.0
        )
        new_rewards = rewards + self.weight * decay * intrinsic
        return state._replace(count=tot, mean=new_mean, m2=new_m2), new_rewards, intrinsic

    def estimate(self, state: RNDState, obs, rewards):
        """Add normalized intrinsic reward to ``rewards``; returns
        (state, new_rewards, intrinsic)."""
        state, nr, intr = self._jit_estimate(state, jnp.asarray(obs), jnp.asarray(rewards))
        return state, nr, intr
