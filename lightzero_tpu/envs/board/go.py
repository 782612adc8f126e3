"""Go as a pure JAX two-player board env (reference zoo/board_games/go/
envs/go_env.py + go_rule_bot; the reference wraps a python Go engine, here
the full rule set — captures, suicide, simple ko, pass-pass ending, area
scoring with komi — is jittable array math so AlphaZero's env-as-simulator
search runs entirely on device).

Rules implemented exactly:
- captures: opponent groups with zero liberties are removed after a play;
- suicide is illegal (legality decomposed exactly: empty & not-ko & [has an
  adjacent empty point, OR captures an adjacent opponent group in atari, OR
  connects to an own group with ≥2 liberties]);
- simple ko: the point just captured in a single-stone capture is forbidden
  for the immediate recapture;
- game ends after two consecutive passes (or the move cap); area scoring
  (stones + territory surrounded by a single color) with komi for white.

Group analysis uses label propagation: each stone's group id is the minimum
cell index in its group, computed by iterated same-color neighbor minima in
a while_loop (≤ board_area iterations, converges in O(board diameter)).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from lightzero_tpu.envs.base import EnvStep, JaxEnv
from lightzero_tpu.utils import ENV_REGISTRY


class GoState(NamedTuple):
    board: jnp.ndarray  # (S*S,) int8: 0 empty, 1 black, 2 white
    to_play: jnp.ndarray  # 1 black, 2 white
    done: jnp.ndarray
    winner: jnp.ndarray  # 0 none/draw, 1 black, 2 white
    t: jnp.ndarray
    passes: jnp.ndarray  # consecutive passes
    ko_point: jnp.ndarray  # int32 forbidden point, -1 none


def _neighbor_idx(S: int):
    """(N, 4) neighbor cell indices, -1 off-board."""
    import numpy as np

    N = S * S
    out = np.full((N, 4), -1, np.int32)
    for r in range(S):
        for c in range(S):
            i = r * S + c
            if r > 0:
                out[i, 0] = i - S
            if r < S - 1:
                out[i, 1] = i + S
            if c > 0:
                out[i, 2] = i - 1
            if c < S - 1:
                out[i, 3] = i + 1
    return out


def group_labels(board: jnp.ndarray, neigh: jnp.ndarray) -> jnp.ndarray:
    """(N,) group id per stone = min cell index in its connected same-color
    group; N (sentinel) for empty cells."""
    N = board.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    lab0 = jnp.where(board > 0, idx, N)

    def body(carry):
        lab, _ = carry
        nlab = jnp.where(neigh >= 0, lab[jnp.maximum(neigh, 0)], N)  # (N,4)
        ncol = jnp.where(neigh >= 0, board[jnp.maximum(neigh, 0)], -1)
        same = ncol == board[:, None]
        cand = jnp.where(same & (board[:, None] > 0), nlab, N)
        new = jnp.minimum(lab, jnp.min(cand, axis=1))
        new = jnp.where(board > 0, new, N)
        return new, jnp.any(new != lab)

    def cond(carry):
        return carry[1]

    lab, _ = jax.lax.while_loop(cond, body, (lab0, jnp.bool_(True)))
    return lab


def group_liberties(board: jnp.ndarray, labels: jnp.ndarray, neigh: jnp.ndarray) -> jnp.ndarray:
    """(N+1,) distinct-liberty count per group id (indexed by the group's
    min cell index; slot N collects empties/garbage)."""
    N = board.shape[0]
    empty = board == 0
    # for each EMPTY cell: the (up to 4) adjacent group labels, deduped so a
    # group touching this empty point via several sides counts it once
    nlab = jnp.where(neigh >= 0, labels[jnp.maximum(neigh, 0)], N)  # (N,4)
    nlab = jnp.where(empty[:, None], nlab, N)
    l0, l1, l2, l3 = nlab[:, 0], nlab[:, 1], nlab[:, 2], nlab[:, 3]
    c0 = jnp.ones_like(l0)
    c1 = (l1 != l0).astype(jnp.int32)
    c2 = ((l2 != l0) & (l2 != l1)).astype(jnp.int32)
    c3 = ((l3 != l0) & (l3 != l1) & (l3 != l2)).astype(jnp.int32)
    libs = jnp.zeros((N + 1,), jnp.int32)
    libs = libs.at[l0].add(c0)
    libs = libs.at[l1].add(c1)
    libs = libs.at[l2].add(c2)
    libs = libs.at[l3].add(c3)
    return libs


def remove_dead(board: jnp.ndarray, labels: jnp.ndarray, libs: jnp.ndarray,
                color: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Remove all ``color`` groups with zero liberties → (board, n_removed)."""
    N = board.shape[0]
    dead = (board == color) & (libs[labels] == 0) & (labels < N)
    return jnp.where(dead, 0, board), jnp.sum(dead)


@ENV_REGISTRY.register("go")
class GoEnv(JaxEnv):
    num_players = 2

    def __init__(self, board_size: int = 9, komi: float = 7.5,
                 battle_mode: str = "self_play_mode", max_moves: int = 0):
        assert battle_mode in ("self_play_mode", "play_with_bot_mode", "eval_mode")
        self.battle_mode = battle_mode
        self.S = board_size
        self.N = board_size * board_size
        self.komi = float(komi)
        self.max_moves = max_moves or 2 * self.N
        self.observation_shape = (board_size, board_size, 3)
        self.action_space_size = self.N + 1  # + pass
        self._neigh = jnp.asarray(_neighbor_idx(board_size))

    # ------------------------------------------------------------- helpers
    def _analysis(self, board):
        labels = group_labels(board, self._neigh)
        libs = group_liberties(board, labels, self._neigh)
        return labels, libs

    def legal_mask_board(self, s: GoState) -> jnp.ndarray:
        """(N,) legality of BOARD points (pass is always legal)."""
        board, me = s.board, s.to_play.astype(s.board.dtype)
        opp = jnp.where(me == 1, 2, 1).astype(board.dtype)
        labels, libs = self._analysis(board)
        N = self.N
        empty = board == 0
        neigh = self._neigh
        nboard = jnp.where(neigh >= 0, board[jnp.maximum(neigh, 0)], -1)
        nlabs = jnp.where(neigh >= 0, labels[jnp.maximum(neigh, 0)], N)
        nlibs = libs[nlabs]
        adj_empty = jnp.any(nboard == 0, axis=1)
        captures = jnp.any((nboard == opp) & (nlibs == 1), axis=1)
        connects_alive = jnp.any((nboard == me) & (nlibs >= 2), axis=1)
        ok = empty & (adj_empty | captures | connects_alive)
        ko = jnp.arange(N) == s.ko_point
        return ok & ~ko & ~s.done

    def legal_mask(self, s: GoState) -> jnp.ndarray:
        return jnp.concatenate(
            [self.legal_mask_board(s), (~s.done)[None]]  # pass
        )

    def observation(self, s: GoState) -> jnp.ndarray:
        S = self.S
        me = s.to_play.astype(s.board.dtype)
        opp = jnp.where(me == 1, 2, 1).astype(s.board.dtype)
        own = (s.board == me).astype(jnp.float32).reshape(S, S)
        other = (s.board == opp).astype(jnp.float32).reshape(S, S)
        color = jnp.full((S, S), (s.to_play == 1).astype(jnp.float32))
        return jnp.stack([own, other, color], axis=-1)

    def _score(self, board):
        """Area scoring: stones + single-color territory; white adds komi.
        Territory: empty regions flood-labeled; a region counts for a color
        iff it touches ONLY that color."""
        N = self.N
        idx = jnp.arange(N, dtype=jnp.int32)
        neigh = self._neigh
        # label empty regions (min-index propagation over empty cells)
        lab0 = jnp.where(board == 0, idx, N)

        def body(carry):
            lab, _ = carry
            nlab = jnp.where(neigh >= 0, lab[jnp.maximum(neigh, 0)], N)
            cand = jnp.where((board[:, None] == 0) & (jnp.where(neigh >= 0, board[jnp.maximum(neigh, 0)], -1)[..., :] == 0), nlab, N)
            new = jnp.minimum(lab, jnp.min(cand, axis=1))
            new = jnp.where(board == 0, new, N)
            return new, jnp.any(new != lab)

        lab, _ = jax.lax.while_loop(lambda c: c[1], body, (lab0, jnp.bool_(True)))
        # per-region color contact
        nboard = jnp.where(neigh >= 0, board[jnp.maximum(neigh, 0)], 0)
        touch_b = jnp.any(nboard == 1, axis=1) & (board == 0)
        touch_w = jnp.any(nboard == 2, axis=1) & (board == 0)
        tb = jnp.zeros((N + 1,), bool).at[lab].max(touch_b)
        tw = jnp.zeros((N + 1,), bool).at[lab].max(touch_w)
        terr_black = (board == 0) & tb[lab] & ~tw[lab]
        terr_white = (board == 0) & tw[lab] & ~tb[lab]
        black = jnp.sum(board == 1) + jnp.sum(terr_black)
        white = jnp.sum(board == 2) + jnp.sum(terr_white)
        return black.astype(jnp.float32), white.astype(jnp.float32) + self.komi

    # ------------------------------------------------------------- dynamics
    def init_state(self) -> GoState:
        return GoState(
            board=jnp.zeros((self.N,), jnp.int8),
            to_play=jnp.ones((), jnp.int32),
            done=jnp.zeros((), bool),
            winner=jnp.zeros((), jnp.int32),
            t=jnp.zeros((), jnp.int32),
            passes=jnp.zeros((), jnp.int32),
            ko_point=jnp.full((), -1, jnp.int32),
        )

    def reset(self, rng: jax.Array) -> Tuple[GoState, jnp.ndarray]:
        s = self.init_state()
        return s, self.observation(s)

    def step_single(self, s: GoState, action: jnp.ndarray) -> GoState:
        N = self.N
        me = s.to_play.astype(s.board.dtype)
        opp = jnp.where(me == 1, 2, 1).astype(s.board.dtype)
        is_pass = action >= N
        cell = jnp.minimum(action, N - 1).astype(jnp.int32)

        board1 = jnp.where(is_pass, s.board, s.board.at[cell].set(me))
        labels, libs = self._analysis(board1)
        board2, n_removed = remove_dead(board1, labels, libs, opp)
        board2 = jnp.where(is_pass, s.board, board2)
        n_removed = jnp.where(is_pass, 0, n_removed)
        # simple ko: single-stone capture where the played stone's group is
        # a lone stone with exactly one liberty afterwards
        labels2, libs2 = self._analysis(board2)
        my_group = labels2[cell]
        group_size = jnp.sum(labels2 == my_group)
        removed_cell = jnp.argmax((board1 != board2) & (board1 == opp))
        ko = (
            (~is_pass)
            & (n_removed == 1)
            & (group_size == 1)
            & (libs2[my_group] == 1)
        )
        ko_point = jnp.where(ko, removed_cell.astype(jnp.int32), -1)

        passes = jnp.where(is_pass, s.passes + 1, 0)
        t = s.t + 1
        game_over = (passes >= 2) | (t >= self.max_moves)
        black, white = self._score(board2)
        winner = jnp.where(
            game_over,
            jnp.where(black > white, 1, jnp.where(white > black, 2, 0)),
            0,
        ).astype(jnp.int32)
        done = s.done | game_over
        return GoState(
            board=board2,
            to_play=jnp.where(me == 1, 2, 1).astype(jnp.int32),
            done=done,
            winner=jnp.where(s.done, s.winner, winner),
            t=t,
            passes=passes,
            ko_point=ko_point,
        )

    def bot_action(self, s: GoState, rng: jax.Array) -> jnp.ndarray:
        """Rule bot: capture-in-1 > save-own-atari > 3rd/4th-line opening
        preference > random legal (not filling own single-point eyes) >
        pass. The role of the reference's go rule bot."""
        N, S = self.N, self.S
        board, me = s.board, s.to_play.astype(s.board.dtype)
        opp = jnp.where(me == 1, 2, 1).astype(board.dtype)
        labels, libs = self._analysis(board)
        neigh = self._neigh
        legal = self.legal_mask_board(s)
        nboard = jnp.where(neigh >= 0, board[jnp.maximum(neigh, 0)], -1)
        nlabs = jnp.where(neigh >= 0, labels[jnp.maximum(neigh, 0)], N)
        nlibs = libs[nlabs]
        captures = jnp.any((nboard == opp) & (nlibs == 1), axis=1)
        saves = jnp.any((nboard == me) & (nlibs == 1), axis=1)
        # avoid filling own eyes: empty point whose 4 neighbors are all own
        own_eye = jnp.all((nboard == me) | (nboard == -1), axis=1) & (board == 0)
        r = jnp.arange(N) // S
        c = jnp.arange(N) % S
        line = jnp.minimum(jnp.minimum(r, S - 1 - r), jnp.minimum(c, S - 1 - c))
        opening = ((line == 2) | (line == 3)).astype(jnp.float32)
        noise = jax.random.uniform(rng, (N,))
        score = (
            captures.astype(jnp.float32) * 100.0
            + saves.astype(jnp.float32) * 50.0
            + opening * 1.0
            + noise
            - own_eye.astype(jnp.float32) * 1000.0
        )
        score = jnp.where(legal, score, -jnp.inf)
        best = jnp.argmax(score).astype(jnp.int32)
        # pass when nothing sensible remains
        return jnp.where(jnp.max(score) > -100.0, best, jnp.int32(N))

    def step(self, s: GoState, action: jnp.ndarray, rng: jax.Array) -> EnvStep:
        if self.battle_mode == "self_play_mode":
            mover = s.to_play
            ns = self.step_single(s, action)
            reward = jnp.where(ns.done & (ns.winner == mover), 1.0,
                               jnp.where(ns.done & (ns.winner != 0), -1.0, 0.0))
        else:
            agent = s.to_play
            ns = self.step_single(s, action)
            bot_rng, rng = jax.random.split(rng)
            bot_a = self.bot_action(ns, bot_rng)
            after_bot = self.step_single(ns, bot_a)
            ns = jax.tree_util.tree_map(lambda a, b: jnp.where(ns.done, a, b), ns, after_bot)
            reward = jnp.where(
                ns.done & (ns.winner == agent), 1.0,
                jnp.where(ns.done & (ns.winner != 0), -1.0, 0.0),
            )
        reset_s, _ = self.reset(rng)
        out_s = jax.tree_util.tree_map(lambda a, b: jnp.where(ns.done, a, b), reset_s, ns)
        return EnvStep(
            state=out_s,
            obs=self.observation(out_s),
            reward=reward.astype(jnp.float32),
            done=ns.done,
            legal_mask=self.legal_mask(out_s),
            to_play=(
                out_s.to_play
                if self.battle_mode == "self_play_mode"
                else jnp.full((), -1, jnp.int32)
            ),
        )

    def initial_to_play(self, state):
        if self.battle_mode == "self_play_mode":
            return state.to_play.astype(jnp.int32)
        return jnp.full((), -1, jnp.int32)
