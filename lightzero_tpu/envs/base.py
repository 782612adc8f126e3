"""Pure-functional environment interface.

The reference runs envs in subprocess managers behind ding's BaseEnv
(SURVEY.md §2.8); here device-friendly envs are pure jittable functions so a
whole vectorized rollout (search + env step + auto-reset) compiles into one
XLA program. Host-side envs (Atari/ALE) implement the same interface
eagerly and are driven in batch from the collector instead.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class EnvStep(NamedTuple):
    state: Any  # env state pytree (post-step, auto-reset applied)
    obs: jnp.ndarray  # observation after the step (new episode obs if done)
    reward: jnp.ndarray  # scalar reward of the transition
    done: jnp.ndarray  # bool episode termination (before auto-reset)
    legal_mask: jnp.ndarray  # (A,) legal actions of the NEW state
    to_play: jnp.ndarray  # player at the NEW state (-1 for 1p)
    # true chance-outcome code of this transition (stochastic envs like
    # 2048; used by Stochastic MuZero's use_true_chance_label path). 0 for
    # deterministic envs.
    chance: jnp.ndarray = jnp.int32(0)
    # episode ended by a time limit rather than a terminal state (gym
    # truncated semantics): value targets should bootstrap at the boundary
    # instead of treating it as absorbing. Only meaningful when done=True.
    truncated: jnp.ndarray = jnp.bool_(False)


class JaxEnv:
    """Protocol for pure JAX envs. All methods are jit/vmap friendly; the
    batch dimension is added by the caller via vmap."""

    observation_shape: Any
    action_space_size: int
    num_players: int = 1

    def reset(self, rng: jax.Array) -> Tuple[Any, jnp.ndarray]:
        """-> (state, obs)"""
        raise NotImplementedError

    def step(self, state: Any, action: jnp.ndarray, rng: jax.Array) -> EnvStep:
        """Apply action; MUST auto-reset when the episode terminates (the
        returned obs/state belong to the fresh episode, ``done`` flags the
        boundary)."""
        raise NotImplementedError

    def legal_mask(self, state: Any) -> jnp.ndarray:
        raise NotImplementedError

    def initial_to_play(self, state: Any) -> jnp.ndarray:
        """Player at a fresh state for MCTS backup semantics: -1 for 1-player
        envs AND for board games in play_with_bot/eval mode (the reference
        sets to_play=-1 there, tictactoe_env.py:176-184); the actual player
        only in self-play mode."""
        return jnp.full((), -1, jnp.int32)
