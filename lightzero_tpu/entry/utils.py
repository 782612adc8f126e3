"""Entry utilities (reference lzero/entry/utils.py): warmup random
collection, eval timeout watchdog, replay-ratio update computation."""
from __future__ import annotations

import threading
from typing import Dict, Optional


def random_collect(collector, buffer, params, num_episodes: int = 8):
    """Warmup collection with uniform-random legal actions (role of
    LightZeroRandomPolicy + random_collect, entry/utils.py:558): run the
    normal collector with epsilon=1 so every action is random while search
    statistics are still recorded for the buffer."""
    episodes, priorities, stats = collector.collect(
        params, temperature=1.0, epsilon=1.0, num_episodes=num_episodes
    )
    buffer.push_episodes(episodes, priorities)
    return stats


def calculate_update_per_collect(cfg, collected_transitions: int) -> int:
    """replay-ratio-driven update count (entry/utils.py:507-556)."""
    upc = cfg.get("update_per_collect", None)
    if upc is not None:
        return int(upc)
    return max(1, int(collected_transitions * float(cfg.get("replay_ratio", 0.25))))


def safe_eval(evaluator, params, n_episodes: Optional[int] = None,
              timeout_s: float = 600.0) -> Optional[Dict]:
    """Evaluation with a timeout watchdog (reference safe_eval,
    entry/utils.py:607-667: a hung evaluator must not deadlock the trainer).
    Returns None on timeout."""
    result = {}
    error = []

    def run():
        try:
            result.update(evaluator.eval(params, n_episodes=n_episodes))
        except Exception as e:  # surface errors to the caller thread
            error.append(e)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        return None  # timed out; thread is daemonic and will be abandoned
    if error:
        raise error[0]
    return result
