"""ctypes loader + on-demand build of the native replay core.

Compiled once per machine into ~/.cache/lightzero_tpu/ with g++ -O3; falls
back to ``available() == False`` (pure-python paths) if no compiler."""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "replay_core.cpp")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[str]:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.path.expanduser("~/.cache/lightzero_tpu")
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"replay_core_{digest}.so")
    if os.path.exists(so_path):
        return so_path
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", so_path],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return so_path
    except Exception:
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.sample_prioritized.argtypes = [
        f64p, ctypes.c_int64, ctypes.c_double, ctypes.c_double,
        ctypes.c_int64, ctypes.c_uint64, i64p, f32p,
    ]
    lib.assemble_unroll.argtypes = [
        i64p, i64p, i64p, u8p, f32p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_double,
        i64p, u8p, i64p, u8p, f32p, f32p, i64p, u8p, f32p,
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def sample_prioritized(priorities: np.ndarray, alpha: float, beta: float,
                       batch: int, seed: int):
    lib = _load()
    n = len(priorities)
    idx = np.empty(batch, np.int64)
    w = np.empty(batch, np.float32)
    lib.sample_prioritized(
        np.ascontiguousarray(priorities, np.float64), n, alpha, beta,
        batch, seed & 0xFFFFFFFFFFFFFFFF, idx, w,
    )
    return idx, w


def assemble_unroll(ep_start, ep_len, pos, truncated, flat_rewards, K: int, td: int,
                    gamma: float):
    lib = _load()
    B = len(pos)
    obs_idx = np.empty((B, K + 1), np.int64)
    obs_valid = np.empty((B, K + 1), np.uint8)
    action_idx = np.empty((B, K), np.int64)
    action_pad = np.empty((B, K), np.uint8)
    mask = np.empty((B, K), np.float32)
    reward_sum = np.empty((B, K + 1), np.float32)
    boot_idx = np.empty((B, K + 1), np.int64)
    boot_valid = np.empty((B, K + 1), np.uint8)
    boot_disc = np.empty((B, K + 1), np.float32)
    lib.assemble_unroll(
        np.ascontiguousarray(ep_start, np.int64),
        np.ascontiguousarray(ep_len, np.int64),
        np.ascontiguousarray(pos, np.int64),
        np.ascontiguousarray(truncated, np.uint8),
        np.ascontiguousarray(flat_rewards, np.float32),
        B, K, td, gamma,
        obs_idx, obs_valid, action_idx, action_pad, mask,
        reward_sum, boot_idx, boot_valid, boot_disc,
    )
    return dict(
        obs_idx=obs_idx, obs_valid=obs_valid, action_idx=action_idx,
        action_pad=action_pad, mask=mask, reward_sum=reward_sum,
        boot_idx=boot_idx, boot_valid=boot_valid, boot_disc=boot_disc,
    )
