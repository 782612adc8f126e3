"""Chess as a pure JAX two-player board env.

Role of reference zoo/board_games/chess/envs/chess_lightzero_env.py (which
wraps python-chess + pettingzoo's chess_utils): same 4672-action AlphaZero
move encoding (64 from-squares x 73 planes: 56 queen slides, 8 knight
moves, 9 underpromotions) and 8x8x20 observation, but the full rule set —
castling, en passant, promotion, 50-move rule, checkmate/stalemate,
insufficient material — is jittable array math, so AlphaZero's
env-as-simulator search runs entirely on device (no python-chess, no host
callbacks).

Encoding (absolute coordinates; no board flip — a side-to-move plane is in
the observation instead):
- square = rank * 8 + file, a1 = 0, h1 = 7, a8 = 56; white plays "up".
- action = from_square * 73 + plane.
  planes 0..55  queen slides: dir d in (N,NE,E,SE,S,SW,W,NW) x dist 1..7,
                plane = d*7 + dist-1.  Serves all slider/step moves, pawn
                pushes/captures (auto-queen on reaching the last rank),
                king steps, and castling (king moves two files).
  planes 56..63 knight moves.
  planes 64..72 underpromotions: 3 directions (push, capture toward file-1,
                capture toward file+1) x 3 pieces (N,B,R).

Legality = vectorized pseudo-legal mask AND NOT(own king attacked after the
move), the latter by vmapping make-move over all 4672 actions and testing
the king square — this makes pins, en-passant discovered checks and
check evasions exact by construction. Validated against standard perft
node counts (tests/test_chess_env.py), the conventional oracle when
python-chess is unavailable.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lightzero_tpu.envs.base import EnvStep, JaxEnv
from lightzero_tpu.utils import ENV_REGISTRY

# piece codes (sign = color: + white, - black)
P, N, B, R, Q, K = 1, 2, 3, 4, 5, 6
NUM_ACTIONS = 64 * 73

# direction order for queen planes and ray tables: (dr, df)
DIRS = ((1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1), (1, -1))
ROOK_DIRS = (0, 2, 4, 6)
KNIGHT_OFF = ((2, 1), (1, 2), (-1, 2), (-2, 1), (-2, -1), (-1, -2), (1, -2), (2, -1))


def _sq(r, c):
    return r * 8 + c if 0 <= r < 8 and 0 <= c < 8 else -1


def _build_tables():
    """Static move-geometry tables (numpy, built once at import)."""
    FROM = np.zeros(NUM_ACTIONS, np.int32)
    TO = np.full((2, NUM_ACTIONS), -1, np.int32)  # [white, black] (differ on underpromo)
    DIRID = np.full(NUM_ACTIONS, -1, np.int32)
    DIST = np.zeros(NUM_ACTIONS, np.int32)
    IS_KNIGHT = np.zeros(NUM_ACTIONS, bool)
    IS_UP = np.zeros(NUM_ACTIONS, bool)
    UP_PIECE = np.zeros(NUM_ACTIONS, np.int32)
    UP_DF = np.zeros(NUM_ACTIONS, np.int32)
    PATH = np.full((NUM_ACTIONS, 6), -1, np.int32)  # intermediate squares of slides

    for f in range(64):
        fr, fc = f // 8, f % 8
        for plane in range(73):
            a = f * 73 + plane
            FROM[a] = f
            if plane < 56:
                d, dist = plane // 7, plane % 7 + 1
                dr, df = DIRS[d]
                t = _sq(fr + dr * dist, fc + df * dist)
                TO[0, a] = TO[1, a] = t
                DIRID[a] = d
                DIST[a] = dist
                if t >= 0:
                    for j in range(1, dist):
                        PATH[a, j - 1] = _sq(fr + dr * j, fc + df * j)
            elif plane < 64:
                dr, df = KNIGHT_OFF[plane - 56]
                t = _sq(fr + dr, fc + df)
                TO[0, a] = TO[1, a] = t
                IS_KNIGHT[a] = True
            else:
                u = plane - 64
                df = (0, -1, 1)[u // 3]
                UP_DF[a] = df
                UP_PIECE[a] = (N, B, R)[u % 3]
                IS_UP[a] = True
                # white: must start on rank 6 moving to rank 7
                TO[0, a] = _sq(fr + 1, fc + df) if fr == 6 else -1
                TO[1, a] = _sq(fr - 1, fc + df) if fr == 1 else -1

    RAY = np.full((64, 8, 7), -1, np.int32)
    for s in range(64):
        r, c = s // 8, s % 8
        for d, (dr, df) in enumerate(DIRS):
            for j in range(1, 8):
                RAY[s, d, j - 1] = _sq(r + dr * j, c + df * j)
    KNT = np.full((64, 8), -1, np.int32)
    KNG = np.full((64, 8), -1, np.int32)
    PAWN_ATK = np.full((2, 64, 2), -1, np.int32)  # squares whence a [white,black] pawn attacks s
    for s in range(64):
        r, c = s // 8, s % 8
        for j, (dr, df) in enumerate(KNIGHT_OFF):
            KNT[s, j] = _sq(r + dr, c + df)
        for j, (dr, df) in enumerate(DIRS):
            KNG[s, j] = _sq(r + dr, c + df)
        PAWN_ATK[0, s] = [_sq(r - 1, c - 1), _sq(r - 1, c + 1)]
        PAWN_ATK[1, s] = [_sq(r + 1, c - 1), _sq(r + 1, c + 1)]
    return dict(FROM=FROM, TO=TO, DIRID=DIRID, DIST=DIST, IS_KNIGHT=IS_KNIGHT,
                IS_UP=IS_UP, UP_PIECE=UP_PIECE, UP_DF=UP_DF, PATH=PATH,
                RAY=RAY, KNT=KNT, KNG=KNG, PAWN_ATK=PAWN_ATK)


_T = {k: jnp.asarray(v) for k, v in _build_tables().items()}


class ChessState(NamedTuple):
    board: jnp.ndarray     # (64,) int8 signed piece codes
    to_play: jnp.ndarray   # 1 white, 2 black
    castling: jnp.ndarray  # (4,) bool: wK, wQ, bK, bQ
    ep_sq: jnp.ndarray     # int32 en-passant target square, -1 none
    halfmove: jnp.ndarray  # int32 50-move counter (plies)
    done: jnp.ndarray
    winner: jnp.ndarray    # 0 draw/none, 1 white, 2 black
    t: jnp.ndarray


# ---------------------------------------------------------------- board math
def _pget(board, sq):
    """board[sq] with sq = -1 reading as empty (off-board sentinel)."""
    return jnp.where(sq >= 0, board[jnp.maximum(sq, 0)], 0)


def square_attacked(board: jnp.ndarray, sq: jnp.ndarray, by_white) -> jnp.ndarray:
    """Is ``sq`` attacked by the given color? by_white: bool array."""
    s = jnp.where(by_white, 1, -1).astype(jnp.int8)
    knt = _pget(board, _T["KNT"][sq])
    kng = _pget(board, _T["KNG"][sq])
    patk = _pget(board, jnp.where(by_white, _T["PAWN_ATK"][0][sq], _T["PAWN_ATK"][1][sq]))
    hit = jnp.any(knt == s * N) | jnp.any(kng == s * K) | jnp.any(patk == s * P)
    ray_sq = _T["RAY"][sq]                         # (8, 7)
    ray_p = _pget(board, ray_sq)                   # (8, 7) pieces along each dir
    occ = (ray_p != 0) | (ray_sq < 0)              # walls block
    blocked_before = jnp.cumsum(occ.astype(jnp.int32), axis=1) - occ.astype(jnp.int32)
    first = occ & (blocked_before == 0)            # one-hot first blocker per dir
    fp = jnp.sum(jnp.where(first, ray_p, 0).astype(jnp.int32), axis=1)  # (8,)
    is_rook_dir = jnp.asarray([d in ROOK_DIRS for d in range(8)])
    si = s.astype(jnp.int32)
    hit |= jnp.any(is_rook_dir & ((fp == si * R) | (fp == si * Q)))
    hit |= jnp.any(~is_rook_dir & ((fp == si * B) | (fp == si * Q)))
    return hit


def _king_sq(board, white):
    code = jnp.where(white, K, -K).astype(board.dtype)
    return jnp.argmax(board == code).astype(jnp.int32)


def make_move(board, castling, ep_sq, action, white):
    """Apply ``action`` for the side ``white`` (bool). Returns
    (board, castling, ep_sq, was_capture, was_pawn_move). Assumes the action
    is geometrically valid; legality is the caller's concern."""
    side = jnp.where(white, 0, 1)
    f = _T["FROM"][action]
    t = _T["TO"][side, action]
    ts = jnp.maximum(t, 0)
    piece = board[f]
    target = board[ts]
    is_pawn = jnp.abs(piece) == P
    sgn = jnp.where(white, 1, -1).astype(board.dtype)

    # en passant: pawn capture landing on the ep square
    is_ep = is_pawn & (t == ep_sq) & (target == 0) & (_T["DIRID"][action] % 2 == 1)
    ep_victim = jnp.where(white, ts - 8, ts + 8)
    # promotion piece: underpromo explicit; queen-plane push into last rank = Q
    last_rank = jnp.where(white, ts // 8 == 7, ts // 8 == 0)
    promo = jnp.where(_T["IS_UP"][action], _T["UP_PIECE"][action],
                      jnp.where(is_pawn & last_rank, Q, 0))
    placed = jnp.where(promo > 0, (promo * sgn.astype(jnp.int32)).astype(board.dtype), piece)

    is_king = jnp.abs(piece) == K
    df = (t % 8) - (f % 8)
    is_castle = is_king & (jnp.abs(df) == 2)
    # rook hop squares for castling (computed from the king's destination)
    rook_from = jnp.where(df > 0, ts + 1, ts - 2)
    rook_to = jnp.where(df > 0, ts - 1, ts + 1)

    nb = board.at[f].set(0)
    nb = nb.at[ts].set(placed)
    nb = jnp.where(is_ep, nb.at[jnp.maximum(ep_victim, 0)].set(0), nb)
    rook_code = (R * sgn.astype(jnp.int32)).astype(board.dtype)
    nb = jnp.where(is_castle,
                   nb.at[jnp.maximum(rook_from, 0)].set(0).at[jnp.maximum(rook_to, 0)].set(rook_code),
                   nb)

    # castling rights: king move clears own pair; rook move/capture clears one
    nc = castling
    nc = jnp.where(is_king & white, nc.at[0].set(False).at[1].set(False), nc)
    nc = jnp.where(is_king & ~white, nc.at[2].set(False).at[3].set(False), nc)
    for sq, slot in ((7, 0), (0, 1), (63, 2), (56, 3)):
        nc = jnp.where((f == sq) | (t == sq), nc.at[slot].set(False), nc)

    # new ep square after a double pawn push
    dbl = is_pawn & (jnp.abs(t - f) == 16)
    nep = jnp.where(dbl, (f + t) // 2, -1).astype(jnp.int32)
    was_capture = (target != 0) | is_ep
    return nb, nc, nep, was_capture, is_pawn


class _MoveCtx(NamedTuple):
    board: jnp.ndarray
    castling: jnp.ndarray
    ep_sq: jnp.ndarray
    white: jnp.ndarray


def pseudo_legal_mask(ctx: _MoveCtx) -> jnp.ndarray:
    """(4672,) geometric pseudo-legality (king safety excluded)."""
    board, castling, ep_sq, white = ctx
    side = jnp.where(white, 0, 1)
    sgn = jnp.where(white, 1, -1).astype(jnp.int32)
    f, t = _T["FROM"], _T["TO"][side]
    piece = board[f].astype(jnp.int32)
    mine = piece * sgn
    tgt = _pget(board, t).astype(jnp.int32) * sgn  # >0 own, <0 enemy
    on = t >= 0
    path_clear = jnp.all(_pget(board, _T["PATH"]) == 0, axis=1)

    d, dist = _T["DIRID"], _T["DIST"]
    rook_dir = (d % 2) == 0
    # slider / step moves
    slide_ok = (
        ((mine == Q) | ((mine == R) & rook_dir) | ((mine == B) & ~rook_dir)
         | ((mine == K) & (dist == 1)))
        & on & path_clear & (tgt <= 0) & (d >= 0)
    )
    # pawns through queen planes (absolute dirs: white uses N/NE/NW, black S/SE/SW)
    fwd = jnp.where(white, 0, 4)
    start_rank = jnp.where(white, 1, 6)
    pawn_push1 = (mine == P) & (d == fwd) & (dist == 1) & on & (tgt == 0)
    pawn_push2 = ((mine == P) & (d == fwd) & (dist == 2) & on & (tgt == 0)
                  & path_clear & (f // 8 == start_rank))
    diag = jnp.where(white, (d == 1) | (d == 7), (d == 3) | (d == 5))
    pawn_cap = (mine == P) & diag & (dist == 1) & on & ((tgt < 0) | (t == ep_sq))
    # knight
    knight_ok = _T["IS_KNIGHT"] & (mine == N) & on & (tgt <= 0)
    # underpromotions (pawn on the 7th relative rank)
    up_push = _T["IS_UP"] & (mine == P) & on & (_T["UP_DF"] == 0) & (tgt == 0)
    up_cap = _T["IS_UP"] & (mine == P) & on & (_T["UP_DF"] != 0) & (tgt < 0)

    ok = slide_ok | pawn_push1 | pawn_push2 | pawn_cap | knight_ok | up_push | up_cap

    # castling: replace the bare king 2-step generated by slide planes
    ksq = jnp.where(white, 4, 60)
    krank = jnp.where(white, 0, 7)
    in_check = square_attacked(board, _king_sq(board, white), ~white)
    rights = jnp.where(white, castling[:2], castling[2:])
    rook = (R * sgn).astype(board.dtype)
    k_e2 = (f == ksq) & (d == 2) & (dist == 2)   # king east two = O-O
    k_w2 = (f == ksq) & (d == 6) & (dist == 2)   # king west two = O-O-O
    oo_ok = (rights[0] & (board[krank * 8 + 7] == rook)
             & (board[krank * 8 + 5] == 0) & (board[krank * 8 + 6] == 0)
             & ~in_check & ~square_attacked(board, krank * 8 + 5, ~white))
    ooo_ok = (rights[1] & (board[krank * 8 + 0] == rook)
              & (board[krank * 8 + 1] == 0) & (board[krank * 8 + 2] == 0)
              & (board[krank * 8 + 3] == 0)
              & ~in_check & ~square_attacked(board, krank * 8 + 3, ~white))
    is_k2 = k_e2 | k_w2
    ok = jnp.where(is_k2 & (mine == K),
                   (k_e2 & oo_ok) | (k_w2 & ooo_ok),
                   ok)
    return ok


def legal_mask_full(ctx: _MoveCtx) -> jnp.ndarray:
    """(4672,) exact legality: pseudo-legal AND the mover's king is not
    attacked after the move (simulated for every action at once)."""
    pseudo = pseudo_legal_mask(ctx)

    def leaves_check(a):
        nb, _, _, _, _ = make_move(ctx.board, ctx.castling, ctx.ep_sq, a, ctx.white)
        return square_attacked(nb, _king_sq(nb, ctx.white), ~ctx.white)

    bad = jax.vmap(leaves_check)(jnp.arange(NUM_ACTIONS, dtype=jnp.int32))
    return pseudo & ~bad


# ------------------------------------------------------------------- the env
_START = np.zeros(64, np.int8)
_START[8:16] = P
_START[48:56] = -P
for _c, _p in enumerate((R, N, B, Q, K, B, N, R)):
    _START[_c] = _p
    _START[56 + _c] = -_p


@ENV_REGISTRY.register("chess")
class ChessEnv(JaxEnv):
    num_players = 2

    def __init__(self, battle_mode: str = "self_play_mode", max_moves: int = 512):
        assert battle_mode in ("self_play_mode", "play_with_bot_mode", "eval_mode")
        self.battle_mode = battle_mode
        self.max_moves = max_moves
        self.observation_shape = (8, 8, 20)
        self.action_space_size = NUM_ACTIONS

    # -------------------------------------------------------------- plumbing
    def init_state(self) -> ChessState:
        return ChessState(
            board=jnp.asarray(_START),
            to_play=jnp.ones((), jnp.int32),
            castling=jnp.ones((4,), bool),
            ep_sq=jnp.full((), -1, jnp.int32),
            halfmove=jnp.zeros((), jnp.int32),
            done=jnp.zeros((), bool),
            winner=jnp.zeros((), jnp.int32),
            t=jnp.zeros((), jnp.int32),
        )

    def reset(self, rng: jax.Array) -> Tuple[ChessState, jnp.ndarray]:
        s = self.init_state()
        return s, self.observation(s)

    def _ctx(self, s: ChessState) -> _MoveCtx:
        return _MoveCtx(s.board, s.castling, s.ep_sq, s.to_play == 1)

    def legal_mask(self, s: ChessState) -> jnp.ndarray:
        return legal_mask_full(self._ctx(s)) & ~s.done

    def observation(self, s: ChessState) -> jnp.ndarray:
        """8x8x20: 12 piece planes (white P..K then black P..K), side to
        move, 4 castling, en-passant file, halfmove/100, ones (ref obs is
        8x8x20 too, chess_lightzero_env.py:118)."""
        b = s.board.reshape(8, 8)
        planes = [(b == c).astype(jnp.float32) for c in range(1, 7)]
        planes += [(b == -c).astype(jnp.float32) for c in range(1, 7)]
        planes.append(jnp.full((8, 8), (s.to_play == 1).astype(jnp.float32)))
        for i in range(4):
            planes.append(jnp.full((8, 8), s.castling[i].astype(jnp.float32)))
        ep_file = jnp.where(s.ep_sq >= 0, s.ep_sq % 8, -1)
        planes.append((jnp.arange(8)[None, :] == ep_file).astype(jnp.float32) * jnp.ones((8, 1)))
        planes.append(jnp.full((8, 8), s.halfmove.astype(jnp.float32) / 100.0))
        planes.append(jnp.ones((8, 8)))
        return jnp.stack(planes, axis=-1)

    # -------------------------------------------------------------- dynamics
    def _insufficient(self, board) -> jnp.ndarray:
        """Draw when neither side can possibly mate: no pawns/rooks/queens
        and at most one minor piece on the whole board."""
        a = jnp.abs(board.astype(jnp.int32))
        heavy = jnp.sum((a == P) | (a == R) | (a == Q))
        minors = jnp.sum((a == N) | (a == B))
        return (heavy == 0) & (minors <= 1)

    def step_single(self, s: ChessState, action: jnp.ndarray) -> ChessState:
        white = s.to_play == 1
        nb, nc, nep, cap, pawn = make_move(s.board, s.castling, s.ep_sq, action, white)
        halfmove = jnp.where(cap | pawn, 0, s.halfmove + 1)
        t = s.t + 1
        opp_white = ~white
        opp_ctx = _MoveCtx(nb, nc, nep, opp_white)
        opp_moves = jnp.any(legal_mask_full(opp_ctx))
        opp_in_check = square_attacked(nb, _king_sq(nb, opp_white), white)
        mate = ~opp_moves & opp_in_check
        stalemate = ~opp_moves & ~opp_in_check
        draw = stalemate | (halfmove >= 100) | (t >= self.max_moves) | self._insufficient(nb)
        game_over = mate | draw
        winner = jnp.where(mate, s.to_play, 0).astype(jnp.int32)
        return ChessState(
            board=nb, to_play=jnp.where(white, 2, 1).astype(jnp.int32),
            castling=nc, ep_sq=nep, halfmove=halfmove,
            done=s.done | game_over,
            winner=jnp.where(s.done, s.winner, winner),
            t=t,
        )

    def bot_action(self, s: ChessState, rng: jax.Array) -> jnp.ndarray:
        """Material-greedy rule bot (role of the reference's chess expert
        bot): best capture by MVV-LVA, promotion bonus, small preference
        for safe central development, else random legal."""
        legal = self.legal_mask(s)
        white = s.to_play == 1
        side = jnp.where(white, 0, 1)
        sgn = jnp.where(white, 1, -1).astype(jnp.int32)
        f, t = _T["FROM"], _T["TO"][side]
        val = jnp.asarray([0.0, 1.0, 3.0, 3.0, 5.0, 9.0, 0.0])
        mover = jnp.abs(s.board[f].astype(jnp.int32))
        victim = jnp.abs(jnp.where(_pget(s.board, t).astype(jnp.int32) * sgn < 0,
                                   _pget(s.board, t).astype(jnp.int32), 0))
        ep_cap = (mover == P) & (t == s.ep_sq)
        gain = val[jnp.minimum(victim, 6)] + jnp.where(ep_cap, 1.0, 0.0)
        promo_q = (mover == P) & ((t // 8 == 7) | (t // 8 == 0)) & (~_T["IS_UP"])
        center = jnp.isin(t, jnp.asarray([27, 28, 35, 36])).astype(jnp.float32)
        # don't hang the mover on an attacked square (1-ply safety)
        def unsafe(a):
            nb, _, _, _, _ = make_move(s.board, s.castling, s.ep_sq, a, white)
            return square_attacked(nb, _T["TO"][side][a], ~white)
        hang = jax.vmap(unsafe)(jnp.arange(NUM_ACTIONS, dtype=jnp.int32))
        noise = jax.random.uniform(rng, (NUM_ACTIONS,))
        score = (gain * 10.0 + jnp.where(promo_q, 80.0, 0.0) + center
                 - jnp.where(hang, val[jnp.minimum(mover, 6)] * 5.0, 0.0) + noise)
        score = jnp.where(legal, score, -jnp.inf)
        return jnp.argmax(score).astype(jnp.int32)

    def step(self, s: ChessState, action: jnp.ndarray, rng: jax.Array) -> EnvStep:
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
            reward = jnp.where(ns.done & (ns.winner == agent), 1.0,
                               jnp.where(ns.done & (ns.winner != 0), -1.0, 0.0))
        reset_s, _ = self.reset(rng)
        out_s = jax.tree_util.tree_map(lambda a, b: jnp.where(ns.done, a, b), reset_s, ns)
        return EnvStep(
            state=out_s,
            obs=self.observation(out_s),
            reward=reward.astype(jnp.float32),
            done=ns.done,
            legal_mask=self.legal_mask(out_s),
            to_play=(out_s.to_play if self.battle_mode == "self_play_mode"
                     else jnp.full((), -1, jnp.int32)),
        )

    def initial_to_play(self, state):
        if self.battle_mode == "self_play_mode":
            return state.to_play.astype(jnp.int32)
        return jnp.full((), -1, jnp.int32)


# --------------------------------------------------------------- test helper
def state_from_fen(fen: str) -> ChessState:
    """Parse a FEN string into a ChessState (host-side; for tests/analysis)."""
    parts = fen.split()
    rows = parts[0].split("/")
    board = np.zeros(64, np.int8)
    codes = {"p": P, "n": N, "b": B, "r": R, "q": Q, "k": K}
    for ri, row in enumerate(rows):
        rank = 7 - ri
        c = 0
        for ch in row:
            if ch.isdigit():
                c += int(ch)
            else:
                board[rank * 8 + c] = codes[ch.lower()] * (1 if ch.isupper() else -1)
                c += 1
    to_play = 1 if parts[1] == "w" else 2
    cast = np.array(["K" in parts[2], "Q" in parts[2],
                     "k" in parts[2], "q" in parts[2]])
    ep = -1
    if len(parts) > 3 and parts[3] != "-":
        ep = (int(parts[3][1]) - 1) * 8 + (ord(parts[3][0]) - ord("a"))
    halfmove = int(parts[4]) if len(parts) > 4 else 0
    return ChessState(
        board=jnp.asarray(board), to_play=jnp.asarray(to_play, jnp.int32),
        castling=jnp.asarray(cast), ep_sq=jnp.asarray(ep, jnp.int32),
        halfmove=jnp.asarray(halfmove, jnp.int32),
        done=jnp.zeros((), bool), winner=jnp.zeros((), jnp.int32),
        t=jnp.zeros((), jnp.int32),
    )
