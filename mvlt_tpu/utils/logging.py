"""Logging + observability.

``setup_logger`` mirrors the reference (``modules/logger.py:82-105``):
INFO to stdout + a flush-per-record file handler (so remote blob mounts see
lines immediately, logger.py:13-79); non-zero ranks get a silent logger.

``MetricLogger`` adds what the reference lacked (SURVEY.md §5): per-step
wall-clock, EMA throughput, and a JSONL metrics stream.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Dict, Optional


class FlushFileHandler(logging.FileHandler):
    def emit(self, record):
        super().emit(record)
        self.flush()


def setup_logger(name: str, save_dir: Optional[str] = None,
                 distributed_rank: int = 0,
                 filename: str = "log.txt") -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.propagate = False
    if distributed_rank > 0:
        return logger
    if logger.handlers:
        return logger
    fmt = logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s")
    sh = logging.StreamHandler(stream=sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        fh = FlushFileHandler(os.path.join(save_dir, filename))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class MetricLogger:
    """Step timing + JSONL metric stream."""

    def __init__(self, save_dir: Optional[str] = None, ema: float = 0.9):
        self._t = None
        self._ema = ema
        self._rate = None
        self._file = None
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            self._file = open(os.path.join(save_dir, "metrics.jsonl"), "a")

    def step(self, step: int, metrics: Dict, samples: int = 0) -> Dict:
        now = time.perf_counter()
        out = {k: float(v) for k, v in metrics.items()}
        if self._t is not None and samples:
            dt = now - self._t
            rate = samples / dt
            self._rate = rate if self._rate is None else (
                self._ema * self._rate + (1 - self._ema) * rate)
            out["samples_per_sec"] = self._rate
            out["step_time_s"] = dt
        self._t = now
        out["step"] = step
        if self._file:
            self._file.write(json.dumps(out) + "\n")
            self._file.flush()
        return out

    def close(self):
        if self._file:
            self._file.close()
