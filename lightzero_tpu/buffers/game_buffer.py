"""Replay buffer with priority sampling, n-step value targets, and
(optionally reanalyzed) policy targets.

Capability-parity rebuild of reference lzero/mcts/buffer/game_buffer.py +
game_buffer_muzero.py, redesigned around the device boundary:

- trajectories are stored host-side as per-episode numpy arrays (the
  reference's GameSegment splitting + cross-segment ``pad_over`` becomes
  unnecessary: whole episodes are stored, so lookahead windows for targets
  never cross a storage boundary);
- per-transition priorities with alpha/beta prioritized sampling + IS
  weights (reference _sample_orig_data, game_buffer.py:105-243);
- target assembly gathers numpy windows then runs ONE jitted batched
  target-network inference for all bootstrap positions
  (_compute_target_reward_value, game_buffer_muzero.py:467-577), and — when
  ``reanalyze_ratio > 0`` — ONE jitted batched MCTS re-search for the policy
  targets (_compute_target_policy_reanalyzed, game_buffer_muzero.py:578-731).
"""
from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from lightzero_tpu.policy.muzero import TrainBatch
from lightzero_tpu.utils import BUFFER_REGISTRY


class EpisodeRecord(NamedTuple):
    """One finished (or truncated) episode, host numpy arrays of length T."""

    obs: np.ndarray  # (T, *obs_shape) raw observation before action t
    actions: np.ndarray  # (T,)
    rewards: np.ndarray  # (T,)
    child_visits: np.ndarray  # (T, A) root visit distributions (normalized)
    root_values: np.ndarray  # (T,) searched root values
    legal_mask: np.ndarray  # (T, A)
    to_play: np.ndarray  # (T,)
    truncated: bool = False  # episode cut by collection end (not terminal)
    chance: Optional[np.ndarray] = None  # (T,) true chance codes (2048 etc.)
    # (T, Ks, D) root sampled action vectors (Sampled MuZero/EZ;
    # reference root_sampled_actions, muzero_collector.py:446)
    root_sampled_actions: Optional[np.ndarray] = None
    # (P, *obs_shape) observations of the P steps immediately before this
    # record's start — set when the record continues a mid-episode flush,
    # consumed by frame stacking instead of zero padding (the reference
    # handles this with cross-segment pad_over, game_segment.py:172)
    prefix_obs: Optional[np.ndarray] = None


@BUFFER_REGISTRY.register("game_buffer_muzero")
class GameBuffer:
    """MuZero replay buffer (1-player and board-game modes)."""

    def __init__(self, cfg, policy):
        self.cfg = cfg
        self.policy = policy
        self._episodes: List[EpisodeRecord] = []
        self._priorities: List[np.ndarray] = []
        self._total_transitions = 0
        self._pushed_transitions = 0
        self.capacity = int(cfg.replay_buffer_size)
        self.alpha = float(cfg.priority_prob_alpha)
        self.beta = float(cfg.priority_prob_beta)
        self.K = int(cfg.num_unroll_steps)
        self.td_steps = int(cfg.td_steps)
        self.discount = float(cfg.discount_factor)
        self.use_priority = bool(cfg.get("use_priority", True))
        self.reanalyze_ratio = float(cfg.get("reanalyze_ratio", 0.0))
        self.frame_stack = int(cfg.get("frame_stack_num", 1))
        self.board_mode = cfg.get("env_type", "not_board_games") == "board_games"
        # winner-z value targets are only valid for self-play trajectories
        # where to_play alternates in {1,2}; in play_with_bot_mode rewards
        # are agent-perspective n-step signals and the plain targets are
        # correct (reference applies winner-sign logic only in self-play)
        self.winner_z_targets = (
            self.board_mode
            and cfg.get("battle_mode", "self_play_mode") == "self_play_mode"
        )
        # column-mirror augmentation for width-symmetric board games whose
        # action space is the column index (connect4): each sampled unroll
        # is left-right mirrored with prob 0.5 — obs (W axis), actions
        # (a -> W-1-a) and policy targets flip together, value/reward are
        # mirror-invariant. Extends the AZ-path dihedral augmentation
        # (ops/board_augment.py, reference lzero/mcts/utils.py:45) onto the
        # MuZero unroll batch; the reference does not augment board MuZero.
        self.mirror_augmentation = bool(cfg.get("mirror_augmentation", False))
        self._rng = np.random.RandomState(cfg.get("seed", 0) + 4096)
        self._jit_bootstrap = jax.jit(self._bootstrap_values)
        # native C++ replay core (sampling + unroll index assembly); the
        # pure-python path remains as fallback and behavioral reference
        from lightzero_tpu.buffers import native as _native

        self._native = _native
        self._use_native = bool(cfg.get("use_native_replay", True)) and _native.available()
        self._flat_dirty = True
        self._flat_priorities = np.zeros(0, np.float64)
        self._flat_ep = np.zeros(0, np.int64)
        self._flat_pos = np.zeros(0, np.int64)

    # ------------------------------------------------------------------ push
    def push_episodes(self, episodes: List[EpisodeRecord], priorities: Optional[List[np.ndarray]] = None):
        for i, ep in enumerate(episodes):
            T = len(ep.actions)
            if T == 0:
                continue
            if priorities is not None and priorities[i] is not None:
                p = np.asarray(priorities[i], np.float64)
            else:
                p = np.full(T, self._max_priority(), np.float64)
            self._episodes.append(ep)
            self._priorities.append(np.maximum(p, 1e-6))
            self._total_transitions += T
            self._pushed_transitions += T
        self._evict()
        self._flat_dirty = True

    def _max_priority(self) -> float:
        if not self._priorities:
            return 1.0
        return max(float(p.max()) for p in self._priorities)

    def _evict(self):
        """remove_oldest_data_to_fit (game_buffer.py:688-731)."""
        while self._total_transitions > self.capacity and len(self._episodes) > 1:
            ep = self._episodes.pop(0)
            self._priorities.pop(0)
            self._total_transitions -= len(ep.actions)
        self._flat_dirty = True

    @property
    def num_transitions(self) -> int:
        return self._total_transitions

    @property
    def num_episodes(self) -> int:
        return len(self._episodes)

    # ---------------------------------------------------------------- sample
    def _rebuild_flat(self):
        if not self._flat_dirty:
            return
        eps, poss, pris = [], [], []
        starts = []
        off = 0
        for e, p in enumerate(self._priorities):
            T = len(p)
            eps.append(np.full(T, e, np.int64))
            poss.append(np.arange(T, dtype=np.int64))
            pris.append(p)
            starts.append(off)
            off += T
        self._flat_ep = np.concatenate(eps) if eps else np.zeros(0, np.int64)
        self._flat_pos = np.concatenate(poss) if poss else np.zeros(0, np.int64)
        self._flat_priorities = np.concatenate(pris) if pris else np.zeros(0, np.float64)
        self._ep_start = np.asarray(starts, np.int64)
        self._ep_len = np.asarray([len(p) for p in self._priorities], np.int64)
        self._ep_trunc = np.asarray([ep.truncated for ep in self._episodes], np.uint8)
        # contiguous pools for the native fast path (numpy bulk gathers)
        if self._episodes and self._use_native:
            self._flat_obs = np.concatenate([e.obs for e in self._episodes])
            self._flat_actions = np.concatenate([e.actions for e in self._episodes])
            self._flat_rewards = np.concatenate([e.rewards for e in self._episodes]).astype(
                np.float32
            )
            self._flat_policies = np.concatenate([e.child_visits for e in self._episodes])
            self._flat_chance = (
                np.concatenate(
                    [
                        e.chance if e.chance is not None else np.zeros(len(e.actions), np.int64)
                        for e in self._episodes
                    ]
                )
                if self._episodes
                else np.zeros(0, np.int64)
            )
        self._flat_dirty = False

    def sample(self, batch_size: int, target_params) -> Tuple[TrainBatch, np.ndarray]:
        """Returns (TrainBatch on device, flat sample indices for
        update_priority)."""
        self._rebuild_flat()
        n = len(self._flat_priorities)
        assert n > 0, "buffer empty"
        if self.use_priority and self._use_native:
            idx, weights = self._native.sample_prioritized(
                self._flat_priorities, self.alpha, self.beta, batch_size,
                int(self._rng.randint(1 << 31)),
            )
        elif self.use_priority:
            probs = self._flat_priorities ** self.alpha
            probs = probs / probs.sum()
            idx = self._rng.choice(n, size=batch_size, p=probs, replace=True)
            weights = (n * probs[idx]) ** (-self.beta)
            weights = weights / weights.max()
        else:
            idx = self._rng.randint(0, n, size=batch_size)
            weights = np.ones(batch_size)

        batch = self._make_batch(idx, target_params, np.asarray(weights, np.float32))
        if self.mirror_augmentation:
            batch = self._mirror_augment(batch)
        return batch, idx

    def _mirror_augment(self, batch: TrainBatch) -> TrainBatch:
        """Left-right mirror each sample with prob 0.5 (column-action boards).

        Valid only when the policy width equals the board width (A == W) and
        actions are discrete column indices; applied AFTER reanalyze so the
        policy targets stay aligned with the (mirrored) observations. Works
        on the output of both the python and native batch paths.
        """
        if not isinstance(batch, TrainBatch):
            # sampled-action / multitask batch layouts carry continuous or
            # per-task action tensors the column mirror cannot remap — fail
            # loudly rather than silently training unaugmented
            raise TypeError(
                "mirror_augmentation is only supported for TrainBatch "
                f"(discrete column-action boards); got {type(batch).__name__}")
        if batch.chance is not None and bool(jnp.any(batch.chance != 0)):
            # chance codes (stochastic MuZero) index env randomness whose
            # spatial meaning the mirror would desync
            raise ValueError(
                "mirror_augmentation cannot be combined with nontrivial "
                "chance codes (stochastic envs)")
        # NHWC board obs only: (B, K+1, H, W[, C]); a 1D MLP obs (B, K+1, D)
        # could coincidentally satisfy A == shape[-2] and flip a wrong axis
        assert batch.obs.ndim >= 4, (
            "mirror_augmentation requires board-shaped obs (B, K+1, H, W[, C]); "
            f"got obs.ndim={batch.obs.ndim}")
        W = int(batch.obs.shape[-2])
        A = int(batch.target_policy.shape[-1])
        assert A == W and batch.actions.dtype in (jnp.int32, jnp.int64), (
            "mirror_augmentation requires column-action boards (A == obs W, "
            f"discrete actions); got A={A} W={W} dtype={batch.actions.dtype}")
        B = int(batch.obs.shape[0])
        flip = jnp.asarray(self._rng.rand(B) < 0.5)

        def pick(mirrored, orig):
            m = flip.reshape((B,) + (1,) * (orig.ndim - 1))
            return jnp.where(m, mirrored, orig)

        return batch._replace(
            obs=pick(batch.obs[..., ::-1, :], batch.obs),
            actions=pick((A - 1) - batch.actions, batch.actions),
            target_policy=pick(batch.target_policy[..., ::-1], batch.target_policy),
        )

    def update_priority(self, idx: np.ndarray, new_priorities: np.ndarray):
        """game_buffer_muzero.py:809 — priorities from |v̂ − z|."""
        self._rebuild_flat()
        new_p = np.maximum(np.asarray(new_priorities, np.float64), 1e-6)
        self._flat_priorities[idx] = new_p
        for j, flat_i in enumerate(np.asarray(idx)):
            e = self._flat_ep[flat_i]
            pos = self._flat_pos[flat_i]
            self._priorities[e][pos] = new_p[j]

    # ------------------------------------------------------------ rezero
    def reanalyze_buffer(self, target_params, rng, reanalyze_batch_size: int = 256,
                         partition: float = 0.75, reuse_search: bool = False) -> int:
        """ReZero-style periodic whole-buffer reanalyze (reference
        game_buffer_rezero_mz.py:101-147, driven by buffer_reanalyze_freq /
        reanalyze_batch_size / reanalyze_partition,
        train_muzero_segment.py:191-208): re-run the search with the target
        net on the newest ``partition`` of stored transitions (temporal
        backward order) and overwrite the stored policy targets in place.

        ``reuse_search=True`` enables the core ReZero mechanism: episodes are
        re-searched strictly backward in time so each position's search can
        reuse the just-computed root value of its successor state via the
        trajectory's true action (game_buffer_rezero_mz.py:279-310;
        search_with_reuse, mcts_ctree.py:368-465).
        Returns the number of reanalyzed transitions."""
        import jax as _jax

        if reuse_search:
            return self._reanalyze_buffer_with_reuse(
                target_params, rng, reanalyze_batch_size, partition
            )
        self._rebuild_flat()
        n = self._total_transitions
        budget = int(n * partition)
        # newest episodes first
        todo = []  # (episode index, position)
        for e in range(len(self._episodes) - 1, -1, -1):
            T = len(self._episodes[e].actions)
            for t in range(T):
                todo.append((e, t))
            if len(todo) >= budget:
                break
        done_count = 0
        for start in range(0, len(todo), reanalyze_batch_size):
            chunk = todo[start : start + reanalyze_batch_size]
            if len(chunk) < reanalyze_batch_size:
                # pad to a fixed batch shape to avoid recompiles
                chunk = chunk + [chunk[-1]] * (reanalyze_batch_size - len(chunk))
            obs = np.stack([self._stacked_obs(self._episodes[e], t) for e, t in chunk])
            legal = np.stack([self._episodes[e].legal_mask[t] for e, t in chunk])
            to_play = np.asarray([self._episodes[e].to_play[t] for e, t in chunk])
            rng, r = _jax.random.split(rng)
            fresh, fresh_values = self.policy.forward_reanalyze(
                target_params,
                r,
                jnp.asarray(obs),
                jnp.asarray(legal),
                jnp.asarray(to_play, jnp.int32),
            )
            fresh = np.asarray(fresh)
            fresh_values = np.asarray(fresh_values)
            for j, (e, t) in enumerate(chunk[: len(todo) - start]):
                self._episodes[e].child_visits[t] = fresh[j]
                self._episodes[e].root_values[t] = fresh_values[j]
                done_count += 1
        # the native fast path serves policy targets from the contiguous
        # _flat_policies pool — invalidate it so the fresh reanalyzed
        # targets take effect this train round, not after the next push
        self._flat_dirty = True
        return done_count

    def _reanalyze_buffer_with_reuse(self, target_params, rng, reanalyze_batch_size: int,
                                     partition: float) -> int:
        """Backward-in-time reanalyze with root-value reuse (ReZero).

        Episodes are processed in groups; within a group, iteration k
        searches every episode's position T_e − k. Iteration 1 (the final
        position of each episode) runs a plain search; every later iteration
        passes the previous iteration's root values as ``reuse_value`` with
        the stored action as ``true_action``, mirroring the reference's
        per-iter threading (game_buffer_rezero_mz.py:279-310)."""
        import jax as _jax
        import jax.numpy as _jnp

        n = self._total_transitions
        budget = int(n * partition)
        eps = []  # newest episodes first
        covered = 0
        for e in range(len(self._episodes) - 1, -1, -1):
            eps.append(e)
            covered += len(self._episodes[e].actions)
            if covered >= budget:
                break
        done_count = 0
        group_size = max(1, int(reanalyze_batch_size))
        for gstart in range(0, len(eps), group_size):
            group = eps[gstart : gstart + group_size]
            G = group_size  # fixed shape to avoid recompiles
            maxT = max(len(self._episodes[e].actions) for e in group)
            reuse_vals = _jnp.zeros((G,), _jnp.float32)
            for k in range(1, maxT + 1):
                pos = [len(self._episodes[e].actions) - k for e in group]
                valid = [p >= 0 for p in pos]
                if not any(valid):
                    break
                rows = []
                for e, p, v in zip(group, pos, valid):
                    rows.append((e, max(p, 0), v))
                while len(rows) < G:
                    rows.append((group[0], 0, False))
                obs = np.stack([self._stacked_obs(self._episodes[e], p) for e, p, _ in rows])
                legal = np.stack([self._episodes[e].legal_mask[p] for e, p, _ in rows])
                to_play = np.asarray([self._episodes[e].to_play[p] for e, p, _ in rows])
                acts = np.asarray([self._episodes[e].actions[p] for e, p, _ in rows])
                rng, r = _jax.random.split(rng)
                if k == 1:
                    fresh, vals = self.policy.forward_reanalyze(
                        target_params, r, _jnp.asarray(obs), _jnp.asarray(legal),
                        _jnp.asarray(to_play, _jnp.int32),
                    )
                else:
                    fresh, vals = self.policy.forward_reanalyze(
                        target_params, r, _jnp.asarray(obs), _jnp.asarray(legal),
                        _jnp.asarray(to_play, _jnp.int32),
                        true_action=_jnp.asarray(acts, _jnp.int32),
                        reuse_value=reuse_vals,
                    )
                reuse_vals = vals.astype(_jnp.float32)
                fresh_np = np.asarray(fresh)
                vals_np = np.asarray(vals)
                for j, (e, p, v) in enumerate(rows):
                    if not v:
                        continue
                    self._episodes[e].child_visits[p] = fresh_np[j]
                    self._episodes[e].root_values[p] = vals_np[j]
                    done_count += 1
        self._flat_dirty = True
        return done_count

    # ------------------------------------------------------------- targets
    def _stacked_obs(self, ep: EpisodeRecord, pos: int) -> np.ndarray:
        """Frame-stacked obs window ending at pos (zero-padded before t=0).
        Channel-stacks along the last axis for image obs; concatenates for
        vector obs with frame_stack>1."""
        if self.frame_stack == 1:
            return ep.obs[pos]
        frames = []
        P = len(ep.prefix_obs) if ep.prefix_obs is not None else 0
        for k in range(pos - self.frame_stack + 1, pos + 1):
            if k >= 0:
                frames.append(ep.obs[k])
            elif P + k >= 0:
                frames.append(ep.prefix_obs[P + k])
            else:
                frames.append(np.zeros_like(ep.obs[0]))
        return np.concatenate(frames, axis=-1)

    def _bootstrap_values(self, target_params, obs: jnp.ndarray) -> jnp.ndarray:
        """(M, *obs) → (M,) target-net root values (fresh initial_inference,
        game_buffer_muzero.py:496). Delegates to the policy so algorithm
        variants (EfficientZero LSTM model etc.) supply their own head."""
        return self.policy._bootstrap_value_fn(target_params, obs)

    def _board_game_value_targets(self, idx) -> np.ndarray:
        """(B, K+1) winner-z value targets for two-player board games: the
        outcome from the perspective of the player to move at each unroll
        position (reference board-game branch of
        _compute_target_reward_value; the reference's discount=1 + episode-
        end bootstrap reduces to exactly this)."""
        K = self.K
        B = len(idx)
        z = np.zeros((B, K + 1), np.float32)
        for b, flat_i in enumerate(idx):
            e = self._flat_ep[flat_i]
            pos = int(self._flat_pos[flat_i])
            ep = self._episodes[e]
            T = len(ep.actions)
            last_mover = int(ep.to_play[T - 1])
            final_r = float(ep.rewards[T - 1])
            # +1 → last mover won; -1 → last mover lost (e.g. komi/penalty
            # conventions); 0 → draw. Robust to negative-only reward schemes.
            if final_r > 0:
                winner = last_mover
            elif final_r < 0:
                winner = 3 - last_mover if last_mover in (1, 2) else 0
            else:
                winner = 0
            if ep.truncated:
                winner = 0  # unfinished game: no outcome signal
            for k in range(K + 1):
                t = pos + k
                if t < T and winner != 0:
                    z[b, k] = 1.0 if int(ep.to_play[t]) == winner else -1.0
        return z

    def _apply_reanalyze(self, idx, target_policy, target_params):
        """Reanalyze the first ceil(B*ratio) samples: fresh MCTS policy
        targets from the target net (reference reanalyze_ratio mixing,
        game_buffer_muzero.py:179-190)."""
        B = len(idx)
        K = self.K
        A = target_policy.shape[-1]
        n_re = int(np.ceil(B * self.reanalyze_ratio)) if self.reanalyze_ratio > 0 else 0
        if n_re == 0:
            return target_policy
        obs_shape = self._stacked_obs(self._episodes[0], 0).shape
        re_obs = np.zeros((n_re, K + 1) + obs_shape, np.float32)
        re_legal = np.zeros((n_re, K + 1, A), bool)
        re_to_play = np.full((n_re, K + 1), -1, np.int64)
        re_valid = np.zeros((n_re, K + 1), np.float32)
        for b in range(n_re):
            e = self._flat_ep[idx[b]]
            pos = int(self._flat_pos[idx[b]])
            ep = self._episodes[e]
            T = len(ep.actions)
            for k in range(K + 1):
                t = pos + k
                if t < T:
                    re_obs[b, k] = self._stacked_obs(ep, t)
                    re_legal[b, k] = ep.legal_mask[t]
                    re_to_play[b, k] = ep.to_play[t]
                    re_valid[b, k] = 1.0
                else:
                    re_legal[b, k, :] = True  # avoid empty-legal search
        M = n_re * (K + 1)
        self._re_rng, r = (
            jax.random.split(self._re_rng)
            if hasattr(self, "_re_rng")
            else jax.random.split(jax.random.PRNGKey(int(self._rng.randint(1 << 30))))
        )
        ctx_kwargs = {}
        if getattr(self.policy, "reanalyze_needs_context", False):
            # thread the true (obs, action) history into the reanalyze roots
            # (reference UniZero buffers, game_buffer_unizero.py:400,544)
            H = int(self.policy.cfg.get("reanalyze_context_steps", 4))
            if H > 0:
                oh = np.zeros((n_re, K + 1, H + 1) + obs_shape, np.float32)
                ah = np.zeros((n_re, K + 1, H), np.int64)
                hl = np.zeros((n_re, K + 1), np.int64)
                for b in range(n_re):
                    e = self._flat_ep[idx[b]]
                    pos = int(self._flat_pos[idx[b]])
                    ep = self._episodes[e]
                    T = len(ep.actions)
                    for k in range(K + 1):
                        t = min(pos + k, T - 1)
                        l = min(t, H)
                        hl[b, k] = l
                        for i in range(l + 1):
                            oh[b, k, H - i] = self._stacked_obs(ep, t - i)
                        for i in range(l):
                            ah[b, k, H - 1 - i] = ep.actions[t - 1 - i]
                ctx_kwargs = dict(
                    obs_hist=jnp.asarray(oh.reshape((M, H + 1) + obs_shape)),
                    act_hist=jnp.asarray(ah.reshape(M, H), jnp.int32),
                    hist_len=jnp.asarray(hl.reshape(M), jnp.int32),
                )
        fresh_policy, _ = self.policy.forward_reanalyze(
            target_params,
            r,
            jnp.asarray(re_obs.reshape((M,) + obs_shape)),
            jnp.asarray(re_legal.reshape(M, A)),
            jnp.asarray(re_to_play.reshape(M), jnp.int32),
            **ctx_kwargs,
        )
        self._re_rng = r
        fresh_policy = np.asarray(fresh_policy).reshape(n_re, K + 1, A)
        target_policy = np.array(target_policy)
        target_policy[:n_re] = fresh_policy * re_valid[..., None]
        return target_policy

    def _make_batch_native(self, idx: np.ndarray, target_params, weights: np.ndarray) -> TrainBatch:
        """Native fast path: C++ index assembly + numpy bulk gathers
        (no per-sample Python loops). Falls back to the reference-python
        path for frame stacking / sampled-action batches."""
        K, td, gamma = self.K, self.td_steps, self.discount
        B = len(idx)
        ep = self._flat_ep[idx]
        out = self._native.assemble_unroll(
            self._ep_start[ep], self._ep_len[ep], self._flat_pos[idx],
            self._ep_trunc[ep], self._flat_rewards, K, td, gamma,
        )
        obs_valid = out["obs_valid"].astype(bool)
        obs_shape = self._flat_obs.shape[1:]
        obs = np.where(
            obs_valid.reshape(B, K + 1, *([1] * len(obs_shape))),
            self._flat_obs[out["obs_idx"]],
            0.0,
        ).astype(np.float32)
        target_policy = np.where(
            obs_valid[..., None], self._flat_policies[out["obs_idx"]], 0.0
        ).astype(np.float32)
        pad = out["action_pad"].astype(bool)
        A = self._flat_policies.shape[1]
        actions = np.where(
            pad, self._rng.randint(0, A, size=(B, K)), self._flat_actions[out["action_idx"]]
        )
        target_reward = np.where(pad, 0.0, self._flat_rewards[out["action_idx"]]).astype(
            np.float32
        )
        boot_obs = self._flat_obs[out["boot_idx"]].astype(np.float32)
        boot_v = np.asarray(
            self._jit_bootstrap(
                target_params, jnp.asarray(boot_obs.reshape((B * (K + 1),) + obs_shape))
            )
        ).reshape(B, K + 1)
        target_value = out["reward_sum"] + out["boot_disc"] * boot_v * out["boot_valid"]
        if self.winner_z_targets:
            target_value = self._board_game_value_targets(idx)
        target_policy = self._apply_reanalyze(idx, target_policy, target_params)
        chance = np.where(pad, 0, self._flat_chance[out["action_idx"]])
        return TrainBatch(
            obs=jnp.asarray(obs),
            actions=jnp.asarray(actions, jnp.int32),
            mask=jnp.asarray(out["mask"]),
            target_reward=jnp.asarray(target_reward),
            target_value=jnp.asarray(target_value.astype(np.float32)),
            target_policy=jnp.asarray(target_policy),
            weights=jnp.asarray(weights),
            chance=jnp.asarray(chance, jnp.int32),
        )

    def _make_batch(self, idx: np.ndarray, target_params, weights: np.ndarray) -> TrainBatch:
        self._rebuild_flat()
        K, td, gamma = self.K, self.td_steps, self.discount
        B = len(idx)
        if (
            self._use_native
            and self.frame_stack == 1
            and self._episodes[0].root_sampled_actions is None
        ):
            return self._make_batch_native(idx, target_params, weights)
        obs_shape = self._stacked_obs(self._episodes[0], 0).shape
        A = self._episodes[0].child_visits.shape[1]

        obs = np.zeros((B, K + 1) + obs_shape, np.float32)
        chance = np.zeros((B, K), np.int64)
        act0 = self._episodes[0].actions
        continuous = act0.dtype.kind == "f" or act0.ndim > 1
        act_shape = act0.shape[1:] if act0.ndim > 1 else ()
        actions = np.zeros((B, K) + act_shape, np.float32 if continuous else np.int64)
        rsa0 = self._episodes[0].root_sampled_actions
        sampled_actions = (
            np.zeros((B, K + 1) + rsa0.shape[1:], np.float32) if rsa0 is not None else None
        )
        mask = np.zeros((B, K), np.float32)
        target_reward = np.zeros((B, K), np.float32)
        reward_sum = np.zeros((B, K + 1), np.float32)
        boot_obs = np.zeros((B, K + 1) + obs_shape, np.float32)
        boot_valid = np.zeros((B, K + 1), np.float32)
        boot_discount = np.zeros((B, K + 1), np.float32)
        target_policy = np.zeros((B, K + 1, A), np.float32)

        for b, flat_i in enumerate(idx):
            e = self._flat_ep[flat_i]
            pos = int(self._flat_pos[flat_i])
            ep = self._episodes[e]
            T = len(ep.actions)
            for k in range(K + 1):
                t = pos + k
                if t < T:
                    obs[b, k] = self._stacked_obs(ep, t)
                    cv = ep.child_visits[t]
                    s = cv.sum()
                    if s > 0:
                        target_policy[b, k] = cv / s
                    if sampled_actions is not None:
                        sampled_actions[b, k] = ep.root_sampled_actions[t]
                # n-step value target pieces (1p; board games use discount=1
                # and winner-perspective values handled upstream). For
                # TRUNCATED episodes (time-limit cut, not terminal) the
                # horizon is capped at T-1 so the tail bootstraps from the
                # last stored obs instead of absorbing to zero.
                if t < T:
                    horizon = T - 1 if ep.truncated else T
                    td_eff = max(min(td, horizon - t), 0)
                    r = 0.0
                    for i in range(td_eff):
                        r += (gamma ** i) * ep.rewards[t + i]
                    reward_sum[b, k] = r
                    boot_t = t + td_eff
                    if boot_t < T:
                        boot_obs[b, k] = self._stacked_obs(ep, boot_t)
                        boot_valid[b, k] = 1.0
                        boot_discount[b, k] = gamma ** td_eff
                # else: beyond episode — all-zero targets (absorbing state)
            for k in range(K):
                t = pos + k
                if t < T:
                    actions[b, k] = ep.actions[t]
                    target_reward[b, k] = ep.rewards[t]
                    if ep.chance is not None:
                        chance[b, k] = ep.chance[t]
                    if t + 1 < T:
                        mask[b, k] = 1.0
                else:
                    if continuous:
                        actions[b, k] = self._rng.uniform(-1, 1, size=act_shape)
                    else:
                        actions[b, k] = self._rng.randint(0, A)

        boot_v = np.asarray(
            self._jit_bootstrap(target_params, jnp.asarray(boot_obs.reshape((B * (K + 1),) + obs_shape)))
        ).reshape(B, K + 1)
        target_value = reward_sum + boot_discount * boot_v * boot_valid
        if self.winner_z_targets:
            target_value = self._board_game_value_targets(idx)

        target_policy = self._apply_reanalyze(idx, target_policy, target_params)

        batch = TrainBatch(
            obs=jnp.asarray(obs),
            actions=jnp.asarray(actions, jnp.float32 if continuous else jnp.int32),
            mask=jnp.asarray(mask),
            target_reward=jnp.asarray(target_reward),
            target_value=jnp.asarray(target_value.astype(np.float32)),
            target_policy=jnp.asarray(target_policy),
            weights=jnp.asarray(weights),
            chance=jnp.asarray(chance, jnp.int32),
        )
        if sampled_actions is not None:
            from lightzero_tpu.policy.sampled_muzero import SampledTrainBatch

            return SampledTrainBatch(base=batch, sampled_actions=jnp.asarray(sampled_actions))
        return batch
