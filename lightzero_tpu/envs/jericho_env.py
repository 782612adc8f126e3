"""Jericho text-adventure host env adapter (gated on ``jericho`` + HF
tokenizer availability).

Capability-parity rebuild of reference zoo/jericho/envs/jericho_env.py:
each step exposes the game text tokenized to fixed ``max_seq_len`` input
ids + attention mask, an action mask over the first ``max_action_num``
valid templates, to_play=-1; optional stuck-action removal (actions whose
text response leaves the observation unchanged) and location/inventory
augmentation. Pairs with the HF text encoder in models/common (the gated
HFLanguageRepresentationNetwork role).

jericho (and its game ROMs) are absent from this image, so this registers
as a *gated* adapter with ``is_available() == False``; the tokenization
fallback (whitespace hashing) keeps the interface testable offline.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def is_available() -> bool:
    try:
        import jericho  # noqa: F401

        return True
    except Exception:
        return False


def hash_tokenize(text: str, max_seq_len: int, vocab_size: int = 32768) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic whitespace+hash tokenizer fallback: keeps the obs
    contract (ids, attention_mask) testable without a HF tokenizer."""
    import hashlib

    ids = []
    for w in text.lower().split()[:max_seq_len]:
        h = int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % (vocab_size - 2)
        ids.append(h + 2)  # 0=pad, 1=unk reserved
    n = len(ids)
    out = np.zeros(max_seq_len, np.int64)
    out[:n] = ids
    mask = np.zeros(max_seq_len, np.int64)
    mask[:n] = 1
    return out, mask


class JerichoVecEnv:
    """Eager host-batched Jericho (HostVecEnv interface: reset_all/step).

    Observations are dicts of arrays: ``input_ids`` (B, L), ``attn_mask``
    (B, L); the legal mask covers the current valid-action templates.
    """

    def __init__(
        self,
        game_path: str,
        num_envs: int = 1,
        seed: int = 0,
        max_action_num: int = 10,
        max_seq_len: int = 512,
        max_steps: int = 400,
        tokenizer_path: Optional[str] = None,
        remove_stuck_actions: bool = False,
        add_location_and_inventory: bool = False,
    ):
        if not is_available():
            raise ImportError(
                "jericho is not installed in this image; JerichoVecEnv is a "
                "gated adapter (zoo/jericho configs compile but cannot run)"
            )
        from jericho import FrotzEnv

        self.num_envs = num_envs
        self.max_action_num = max_action_num
        self.max_seq_len = max_seq_len
        self.max_steps = max_steps
        self.remove_stuck_actions = remove_stuck_actions
        self.add_location_and_inventory = add_location_and_inventory
        self.action_space_size = max_action_num
        self.observation_shape = max_seq_len
        self.continuous = False
        self._tok = None
        if tokenizer_path:
            try:
                from transformers import AutoTokenizer

                self._tok = AutoTokenizer.from_pretrained(tokenizer_path)
            except Exception:
                self._tok = None  # fall back to hash_tokenize
        self._envs = [FrotzEnv(game_path, seed=seed + i) for i in range(num_envs)]
        self._valid: List[List[str]] = [[] for _ in range(num_envs)]
        self._last_obs: List[str] = ["" for _ in range(num_envs)]
        self._steps = np.zeros(num_envs, np.int64)

    # ---------------- text → arrays ----------------------------------------
    def _encode(self, text: str) -> Tuple[np.ndarray, np.ndarray]:
        if self._tok is not None:
            enc = self._tok(
                text, truncation=True, padding="max_length", max_length=self.max_seq_len
            )
            return np.asarray(enc["input_ids"], np.int64), np.asarray(
                enc["attention_mask"], np.int64
            )
        return hash_tokenize(text, self.max_seq_len)

    def _obs_text(self, i: int, raw: str) -> str:
        if not self.add_location_and_inventory:
            return raw
        e = self._envs[i]
        try:
            loc = e.get_player_location().name
            inv = ", ".join(o.name for o in e.get_inventory())
            return f"location: {loc}. inventory: {inv}. {raw}"
        except Exception:
            return raw

    def _refresh_valid(self, i: int):
        acts = list(self._envs[i].get_valid_actions())[: self.max_action_num]
        self._valid[i] = acts

    def _pack(self, texts: List[str]):
        ids, masks = zip(*(self._encode(t) for t in texts))
        legal = np.zeros((self.num_envs, self.max_action_num), bool)
        for i in range(self.num_envs):
            legal[i, : len(self._valid[i])] = True
            if not self._valid[i]:
                legal[i, 0] = True  # always at least one arm
        return dict(input_ids=np.stack(ids), attn_mask=np.stack(masks)), legal

    # ---------------- HostVecEnv interface ----------------------------------
    def reset_all(self):
        texts = []
        for i, e in enumerate(self._envs):
            raw, _ = e.reset()
            self._steps[i] = 0
            self._last_obs[i] = raw
            self._refresh_valid(i)
            texts.append(self._obs_text(i, raw))
        obs, legal = self._pack(texts)
        return obs, legal, np.full((self.num_envs,), -1, np.int64)

    def step(self, actions: np.ndarray):
        texts, rewards, dones = [], [], []
        for i, e in enumerate(self._envs):
            a = int(actions[i])
            cmd = self._valid[i][a] if a < len(self._valid[i]) else "look"
            raw, r, done, _info = e.step(cmd)
            self._steps[i] += 1
            if self.remove_stuck_actions and raw == self._last_obs[i] and cmd in self._valid[i]:
                self._valid[i].remove(cmd)  # prune no-op actions (reference flag)
            else:
                self._refresh_valid(i)
            self._last_obs[i] = raw
            d = bool(done or self._steps[i] >= self.max_steps)
            if d:
                raw, _ = e.reset()
                self._steps[i] = 0
                self._refresh_valid(i)
            texts.append(self._obs_text(i, raw))
            rewards.append(float(r))
            dones.append(d)
        obs, legal = self._pack(texts)
        return (
            obs,
            np.asarray(rewards, np.float32),
            np.asarray(dones, bool),
            legal,
            np.full((self.num_envs,), -1, np.int64),
        )
