"""Config helpers (reference lzero/config/utils.py: lz_to_ddp_config divides
batch_size/n_episode by world size, :15-21). The TPU equivalent divides
per-host quantities by the number of local devices in the dp mesh."""
from __future__ import annotations

import copy

from lightzero_tpu.config import Config


def lz_to_dp_config(cfg: Config, num_devices: int) -> Config:
    """Scale a single-device config for data parallelism over
    ``num_devices``: the GLOBAL batch/n_episode stay the same, per-device
    shares shrink. (With pjit the global batch is simply sharded, so only
    bookkeeping quantities change here.)"""
    cfg = Config(copy.deepcopy(dict(cfg)))
    p = cfg.policy
    p.batch_size = max(num_devices, int(p.batch_size) // num_devices * num_devices)
    if "n_episode" in p:
        p.n_episode = max(1, int(p.n_episode) // num_devices)
    p.num_devices = num_devices
    return cfg
