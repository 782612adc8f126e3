"""Shared helpers for board-game tests."""
import numpy as np

import jax.numpy as jnp

from lightzero_tpu.envs.board.tictactoe import TTTState


def batched_state(boards, to_play):
    boards = np.asarray(boards, np.int8)
    B = boards.shape[0]
    return TTTState(
        board=jnp.asarray(boards),
        to_play=jnp.asarray(to_play, jnp.int32),
        done=jnp.zeros((B,), bool),
        winner=jnp.zeros((B,), jnp.int32),
        t=jnp.asarray((boards != 0).sum(-1), jnp.int32),
    )
