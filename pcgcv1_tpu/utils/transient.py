"""Transient-failure classification for accelerator/relay runtime errors.

The TPU is reached through a network relay; long runs occasionally see
spurious XlaRuntimeErrors (FAILED_PRECONDITION / UNAVAILABLE / stream
resets) that a fresh dispatch survives. Consumers: the trainer's
checkpoint-restore recovery (training/train.py), the eval sweep's
per-rate-point retry (evalharness.py), and bench.py's process-level
retry. No reference equivalent (single local GPU, no failure handling).
"""

from __future__ import annotations

# Deliberately narrow: OOMs (RESOURCE_EXHAUSTED), shape/type errors, and
# everything Python-level re-raise — only infrastructure flakiness between
# the host and the accelerator is retried.
TRANSIENT_MARKERS = (
    "FAILED_PRECONDITION", "UNAVAILABLE", "DEADLINE_EXCEEDED", "ABORTED",
    "INTERNAL", "Socket closed", "Connection reset", "connection refused",
    "Broken pipe",
)


def is_transient(e: BaseException) -> bool:
    msg = f"{type(e).__name__}: {e}"
    if "RESOURCE_EXHAUSTED" in msg:
        return False
    return any(m in msg for m in TRANSIENT_MARKERS)
