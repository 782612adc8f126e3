"""Shared buffer test helpers."""
import numpy as np

from lightzero_tpu.buffers import EpisodeRecord


def fake_episode(T=20, A=2, obs_dim=4, seed=0, truncated=False):
    rng = np.random.RandomState(seed)
    visits = rng.randint(1, 10, size=(T, A)).astype(np.float32)
    return EpisodeRecord(
        obs=rng.randn(T, obs_dim).astype(np.float32),
        actions=rng.randint(0, A, size=T),
        rewards=rng.randn(T).astype(np.float32),
        child_visits=visits / visits.sum(-1, keepdims=True),
        root_values=rng.randn(T).astype(np.float32),
        legal_mask=np.ones((T, A), bool),
        to_play=np.full(T, -1),
        truncated=truncated,
    )
