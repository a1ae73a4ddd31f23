"""Metric logging: JSONL always, TensorBoard when available.

Keeps the reference's tag schema (reference: config.py:136-157, written via
tensorboardX at train.py:288-306,365-372,392-394) so existing dashboards read
the new runs unchanged. The JSONL stream is the primary artifact — greppable,
diffable, no TB dependency.
"""

from __future__ import annotations

import json
import os
import time


class MetricWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def scalar(self, tag: str, value: float, step: int) -> None:
        rec = {"t": time.time(), "step": int(step), "tag": tag,
               "value": float(value)}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def text(self, tag: str, text: str, step: int) -> None:
        rec = {"t": time.time(), "step": int(step), "tag": tag, "text": text}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_text(tag, text, step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
