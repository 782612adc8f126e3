"""Chess env validation.

Perft node counts are the standard oracle for move-generator correctness
(the reference relies on python-chess, absent here; these positions +
counts are the community-standard suite covering castling, en passant,
promotions, pins and check evasion).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast tier

from lightzero_tpu.envs.board.chess import (
    ChessEnv, _MoveCtx, legal_mask_full, make_move, state_from_fen, NUM_ACTIONS, _T,
)


@jax.jit
def _mask(board, castling, ep, white):
    return legal_mask_full(_MoveCtx(board, castling, ep, white))


@jax.jit
def _apply(board, castling, ep, a, white):
    nb, nc, nep, _, _ = make_move(board, castling, ep, a, white)
    return nb, nc, nep


def perft(board, castling, ep, white, depth):
    mask = np.asarray(_mask(board, castling, ep, white))
    acts = np.nonzero(mask)[0]
    if depth == 1:
        return len(acts)
    total = 0
    for a in acts:
        nb, nc, nep = _apply(board, castling, ep, jnp.int32(int(a)), white)
        total += perft(nb, nc, nep, ~white, depth - 1)
    return total


def _perft_fen(fen, depth):
    s = state_from_fen(fen)
    return perft(s.board, s.castling, s.ep_sq, s.to_play == 1, depth)


START = "rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR w KQkq - 0 1"
KIWIPETE = "r3k2r/p1ppqpb1/bn2pnp1/3PN3/1p2P3/2N2Q1p/PPPBBPPP/R3K2R w KQkq - 0 1"
POS3 = "8/2p5/3p4/KP5r/1R3p1k/8/4P1P1/8 w - - 0 1"
POS4 = "r3k2r/Pppp1ppp/1b3nbN/nP6/BBP1P3/q4N2/Pp1P2PP/R2Q1RK1 w kq - 0 1"
POS5 = "rnbq1k1r/pp1Pbppp/2p5/8/2B5/8/PPP1NnPP/RNBQK2R w KQ - 1 8"


@pytest.mark.parametrize("fen,depth,expected", [
    (START, 1, 20),
    (START, 2, 400),
    (START, 3, 8902),
    (KIWIPETE, 1, 48),
    (KIWIPETE, 2, 2039),
    (POS3, 1, 14),
    (POS3, 2, 191),
    (POS3, 3, 2812),
    (POS4, 1, 6),
    (POS4, 2, 264),
    (POS5, 1, 44),
    (POS5, 2, 1486),
])
def test_perft(fen, depth, expected):
    assert _perft_fen(fen, depth) == expected


def _act(frm, to, plane=None):
    """Helper: action id from from/to squares via the queen/knight tables."""
    for a in range(frm * 73, (frm + 1) * 73):
        if plane is not None and a % 73 != plane:
            continue
        if int(_T["TO"][0, a]) == to:
            return a
    raise AssertionError("no action")


def test_fools_mate():
    env = ChessEnv()
    s = env.init_state()
    rng = jax.random.PRNGKey(0)

    def sq(name):
        return (int(name[1]) - 1) * 8 + (ord(name[0]) - ord("a"))

    for mv in [("f2", "f3"), ("e7", "e5"), ("g2", "g4"), ("d8", "h4")]:
        a = _act(sq(mv[0]), sq(mv[1]))
        assert bool(env.legal_mask(s)[a]), mv
        s = env.step_single(s, jnp.int32(a))
    assert bool(s.done)
    assert int(s.winner) == 2  # black delivered mate


def test_stalemate_and_fifty_move():
    # classic stalemate: black king a8, white queen c7, white king c6, black to move
    s = state_from_fen("k7/2Q5/2K5/8/8/8/8/8 b - - 0 1")
    env = ChessEnv()
    assert int(jnp.sum(env.legal_mask(s))) == 0
    # drive it through step_single: white plays Qc7 from c2 with black king a8
    s2 = state_from_fen("k7/8/2K5/8/8/8/2Q5/8 w - - 0 1")
    a = _act(10, 50)  # c2 -> c7
    ns = env.step_single(s2, jnp.int32(a))
    assert bool(ns.done) and int(ns.winner) == 0  # stalemate draw
    # fifty-move rule
    s3 = state_from_fen("k7/8/2K5/8/8/8/2Q5/8 w - - 99 80")
    a2 = _act(10, 18)  # quiet queen move c2 -> c3
    ns3 = env.step_single(s3, jnp.int32(a2))
    assert bool(ns3.done) and int(ns3.winner) == 0


def test_en_passant_and_castling_roundtrip():
    env = ChessEnv()
    # en passant: after 1.e4 a6 2.e5 d5, exd6 e.p. must be legal
    s = state_from_fen("rnbqkbnr/1pp1pppp/p7/3pP3/8/8/PPPP1PPP/RNBQKBNR w KQkq d6 0 3")
    exd6 = _act(36, 43)  # e5 -> d6
    assert bool(env.legal_mask(s)[exd6])
    ns = env.step_single(s, jnp.int32(exd6))
    assert int(ns.board[35]) == 0  # d5 pawn removed
    # castling kingside from the start-ish position with cleared squares
    s2 = state_from_fen("r3k2r/pppppppp/8/8/8/8/PPPPPPPP/R3K2R w KQkq - 0 1")
    oo = _act(4, 6)
    ooo = _act(4, 2)
    m = env.legal_mask(s2)
    assert bool(m[oo]) and bool(m[ooo])
    ns2 = env.step_single(s2, jnp.int32(oo))
    assert int(ns2.board[6]) == 6 and int(ns2.board[5]) == 4  # Kg1, Rf1
    assert not bool(ns2.castling[0]) and not bool(ns2.castling[1])


def test_promotion_underpromotion():
    env = ChessEnv()
    s = state_from_fen("8/P6k/8/8/8/8/8/K7 w - - 0 1")
    m = env.legal_mask(s)
    # a7->a8 queen (queen plane) + 3 underpromotions (N, B, R) = 4 promo actions
    promo_acts = [a for a in np.nonzero(np.asarray(m))[0] if int(_T["FROM"][a]) == 48]
    assert len(promo_acts) == 4
    qa = _act(48, 56)
    ns = env.step_single(s, jnp.int32(qa))
    assert int(ns.board[56]) == 5  # queen


def test_env_api_and_bot_game():
    env = ChessEnv(battle_mode="play_with_bot_mode")
    rng = jax.random.PRNGKey(0)
    s, obs = env.reset(rng)
    assert obs.shape == (8, 8, 20)
    assert env.action_space_size == NUM_ACTIONS
    step = jax.jit(env.step)
    jmask = jax.jit(env.legal_mask)
    jbot = jax.jit(env.bot_action)
    for i in range(6):
        rng, k1, k2 = jax.random.split(rng, 3)
        mask = jmask(s)
        a = jbot(s, k1)
        assert bool(mask[a])
        out = step(s, a, k2)
        s = out.state
        assert out.obs.shape == (8, 8, 20)
    # bot vs bot self-play terminates within the move cap
    env_sp = ChessEnv(battle_mode="self_play_mode", max_moves=60)
    s, _ = env_sp.reset(rng)
    sp_step = jax.jit(env_sp.step)
    sp_bot = jax.jit(env_sp.bot_action)
    done = False
    for i in range(60):
        rng, k1, k2 = jax.random.split(rng, 3)
        a = sp_bot(s, k1)
        out = sp_step(s, a, k2)
        if bool(out.done):
            done = True
            break
        s = out.state
    assert done
