"""Experiment logging: text + JSONL + optional TensorBoard.

Covers the reference's three sinks (SURVEY.md §5.5): per-component text
logs, TensorBoard scalars (via torch's SummaryWriter when available), and a
machine-readable JSONL stream per component.
"""
from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional


class ExperimentLogger:
    def __init__(self, exp_dir: str, name: str = "train", use_tb: bool = True):
        self.exp_dir = exp_dir
        log_dir = os.path.join(exp_dir, "log")
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl_path = os.path.join(log_dir, f"{name}.jsonl")
        self._jsonl = open(self.jsonl_path, "a")
        self.logger = logging.getLogger(f"lightzero_tpu.{name}.{id(self)}")
        self.logger.setLevel(logging.INFO)
        self.logger.propagate = False
        if not self.logger.handlers:
            fh = logging.FileHandler(os.path.join(log_dir, f"{name}.txt"))
            fh.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
            sh = logging.StreamHandler()
            sh.setFormatter(logging.Formatter("[%(asctime)s] %(message)s", "%H:%M:%S"))
            self.logger.addHandler(fh)
            self.logger.addHandler(sh)
        self.tb = None
        if use_tb:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(os.path.join(log_dir, "serial"))
            except Exception:
                self.tb = None
        # optional wandb sink (reference use_wandb, train_muzero.py:84-92 /
        # muzero.py:668-670) — active only when wandb is importable AND the
        # run opts in via WANDB_LIGHTZERO=1 (offline-safe default)
        self.wandb = None
        if os.environ.get("WANDB_LIGHTZERO", "0") == "1":
            try:
                import wandb

                self.wandb = wandb
                wandb.init(project=os.environ.get("WANDB_PROJECT", "lightzero_tpu"),
                           name=os.path.basename(exp_dir), dir=log_dir)
            except Exception:
                self.wandb = None

    def log_scalars(self, scalars: Dict[str, float], step: int, prefix: str = ""):
        clean = {}
        for k, v in scalars.items():
            try:
                clean[k] = float(v)
            except (TypeError, ValueError):
                continue
        rec = {"step": step, "time": time.time(), **{prefix + k: v for k, v in clean.items()}}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self.tb is not None:
            for k, v in clean.items():
                self.tb.add_scalar(prefix + k, v, step)
        if self.wandb is not None:
            self.wandb.log({prefix + k: v for k, v in clean.items()}, step=step)

    def info(self, msg: str):
        self.logger.info(msg)

    def close(self):
        self._jsonl.close()
        if self.tb is not None:
            self.tb.close()
