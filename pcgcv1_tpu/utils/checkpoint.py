"""Orbax-backed checkpoints.

Capability parity with the reference's `tf.train.Checkpoint` object graphs
keyed by module name (`train_hyper.py:107-121`): a checkpoint is a pytree
{"analysis": ..., "synthesis": ..., "hyper_encoder": ..., "hyper_decoder":
..., "estimator": ..., optionally "opt_state", "step"}. Inference restores
subsets of the same tree (`transform.py:36-38,107-112` in the reference).
"""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp


def save(ckpt_dir, tree, step=None):
    """Save a pytree checkpoint; keeps one dir per step."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    name = f"ckpt-{step}" if step is not None else "ckpt"
    path = os.path.join(ckpt_dir, name)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(tree), force=True)
    ckptr.wait_until_finished()
    return path


def latest_path(ckpt_dir):
    ckpt_dir = os.path.abspath(ckpt_dir)
    if not os.path.isdir(ckpt_dir):
        return None
    cands = [d for d in os.listdir(ckpt_dir) if d.startswith("ckpt")]
    if not cands:
        return None

    def step_of(name):
        try:
            return int(name.split("-")[1])
        except (IndexError, ValueError):
            return -1

    return os.path.join(ckpt_dir, max(cands, key=step_of))


def restore(ckpt_dir, like=None):
    """Restore the latest checkpoint in ckpt_dir.

    Args:
      like: optional pytree of the expected structure (enables partial /
        shape-checked restore).
    Returns the restored pytree, or None when the dir holds no checkpoint.
    """
    path = latest_path(ckpt_dir)
    if path is None:
        return None
    ckptr = ocp.StandardCheckpointer()
    if like is None:
        return ckptr.restore(path)
    like = jax.tree.map(np.asarray, jax.device_get(like))
    return ckptr.restore(path, target=like)
