"""Human-normalized benchmark stats (reference
lzero/entry/utils.py:compute_unizero_mt_normalized_stats and the 26-game
RANDOM/HUMAN tables in train_unizero_multitask_segment_ddp.py:77-100)."""
import numpy as np
import pytest

from lightzero_tpu.utils.benchmark_scores import (
    ATARI100K_SCORES,
    human_normalized,
    normalized_stats,
)

pytestmark = pytest.mark.unittest


def test_table_is_complete_26_games():
    assert len(ATARI100K_SCORES) == 26
    for game, (rnd, hum) in ATARI100K_SCORES.items():
        assert hum > rnd, game


def test_human_normalized_anchors():
    # random -> 0, human -> 1
    assert human_normalized(-20.7, "Pong") == pytest.approx(0.0)
    assert human_normalized(14.6, "Pong") == pytest.approx(1.0)
    # superhuman > 1
    assert human_normalized(30.5, "Breakout") == pytest.approx(1.0)
    assert human_normalized(60.0, "Breakout") > 1.0


def test_name_canonicalization():
    for alias in ("PongNoFrameskip-v4", "pong", "ms_pacman", "MsPacman-v5"):
        assert human_normalized(0.0, alias) is not None, alias
    assert human_normalized(1.0, "not_a_game") is None


def test_normalized_stats_skips_unknown_and_none():
    mean, med = normalized_stats({"Pong": 14.6, "Breakout": 1.7,
                                  "mystery": 5.0, "Qbert": None})
    # Pong=1.0, Breakout=0.0; mystery/None skipped
    assert mean == pytest.approx(0.5)
    assert med == pytest.approx(0.5)
    assert normalized_stats({"mystery": 1.0}) == (None, None)
    assert normalized_stats({}) == (None, None)


def test_dmc_benchmark():
    assert human_normalized(500.0, "cartpole-swingup", benchmark="dmc") == pytest.approx(0.5)
    mean, med = normalized_stats({"walker-walk": 1000.0, "cheetah-run": 0.0},
                                 benchmark="dmc")
    assert mean == pytest.approx(0.5)
