"""Metrics logging: a SummaryWriter-compatible scalar writer.

Replaces the reference's torch.utils.tensorboard SummaryWriter threading
(generative.py:63-78, training.py:89) with a dependency-free JSONL writer
exposing the same ``add_scalar(tag, value, global_step)`` API, with
throttling (``logging_interval``) and an in-memory store for tests and
plots.  If a tensorboard implementation is importable it is mirrored to
transparently.
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from typing import Optional


class MetricsWriter:
    """JSONL + in-memory scalar writer (tag -> [(step, value)])."""

    def __init__(self, logdir: Optional[str] = None, comment: str = "",
                 logging_interval: int = 1, mirror_tensorboard: bool = True):
        self.logging_interval = int(logging_interval)
        self.scalars = defaultdict(list)
        self._fh = None
        self._tb = None
        self.logdir = logdir
        if logdir is not None:
            os.makedirs(logdir, exist_ok=True)
            fname = f"metrics{('_' + comment) if comment else ''}.jsonl"
            # line-buffered: scalars must survive a killed run
            self._fh = open(os.path.join(logdir, fname), "a", buffering=1)
            if mirror_tensorboard:
                try:  # pragma: no cover - optional dependency
                    from torch.utils.tensorboard import SummaryWriter
                    self._tb = SummaryWriter(log_dir=logdir, comment=comment)
                except Exception:
                    self._tb = None

    def add_scalar(self, tag: str, value, global_step: Optional[int] = None):
        if (self.logging_interval > 1 and global_step is not None
                and global_step % self.logging_interval != 0):
            return
        value = float(value)
        self.scalars[tag].append((global_step, value))
        if self._fh is not None:
            self._fh.write(json.dumps({"tag": tag, "step": global_step,
                                       "value": value, "t": time.time()})
                           + "\n")

        if self._tb is not None:  # pragma: no cover
            self._tb.add_scalar(tag, value, global_step=global_step)

    def add_scalars(self, logs: dict, global_step: Optional[int] = None,
                    prefix: str = ""):
        for tag, value in logs.items():
            # tags that already carry a namespace keep it
            full = tag if "/" in tag else prefix + tag
            self.add_scalar(full, value, global_step)

    def add_hparams(self, hparam_dict: dict, metric_dict: dict):
        if self._fh is not None:
            self._fh.write(json.dumps({"hparams": hparam_dict,
                                       "metrics": metric_dict}) + "\n")
        if self._tb is not None:  # pragma: no cover
            self._tb.add_hparams(hparam_dict, metric_dict)

    def flush(self):
        if self._fh is not None:
            self._fh.flush()
        if self._tb is not None:  # pragma: no cover
            self._tb.flush()

    def close(self):
        self.flush()
        if self._fh is not None:
            self._fh.close()
            self._fh = None
        if self._tb is not None:  # pragma: no cover
            self._tb.close()
