"""Metric logging: JSONL always, TensorBoard when available.

Capability parity with the reference's observability
(`tf.contrib.summary` scalar writers for bpp_ae/bpp_hyper/bpp/IoU,
train_hyper.py:240-266, plus its print logging). JSONL is the source of
truth (machine-readable, dependency-free); TensorBoard event files are
written too when the package is importable.
"""

from __future__ import annotations

import json
import os


class MetricLogger:
    def __init__(self, log_dir, name="train", print_fn=print,
                 tensorboard=True):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{name}_log.jsonl")
        self.print_fn = print_fn
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(os.path.join(log_dir, "tb", name))
            except Exception:
                self._tb = None

    def __call__(self, metrics: dict):
        step = int(metrics.get("step", 0))
        if self.print_fn is not None:
            self.print_fn(" ".join(
                f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in metrics.items()), flush=True)
        with open(self.path, "a") as f:
            f.write(json.dumps(metrics) + "\n")
        if self._tb is not None:
            for k, v in metrics.items():
                if k != "step" and isinstance(v, (int, float)):
                    self._tb.add_scalar(k, v, step)
            self._tb.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
