"""Losses and classification metrics.

Capability parity with the reference `loss.py`:

- weighted binary cross entropy split into empty/full terms
  (`loss.py:8-33`); the reference gathers occupied/empty positions with
  `tf.where` + `gather_nd` (dynamic shapes) — here masked means, identical
  values, jit/TPU-friendly static shapes;
- confusion-matrix precision/recall/IoU at a threshold (`loss.py:35-78`);
- focal loss (`loss.py:83-93`, kept for parity; unused by the trainers,
  same as the reference);
- bpp accounting normalized by occupied input voxels
  (`train_hyper.py:194-196`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_losses(pred_logits, label):
    """(empty_loss, full_loss): masked means of -log(1-p) / -log(p).

    Args:
      pred_logits: [B, ...] float logits.
      label: same shape, 0/1 occupancy.
    """
    occupancy = jnp.clip(jax.nn.sigmoid(pred_logits), 1e-7, 1.0 - 1e-7)
    pos = (label > 0).astype(pred_logits.dtype)
    neg = 1.0 - pos
    n_pos = jnp.maximum(pos.sum(), 1.0)
    n_neg = jnp.maximum(neg.sum(), 1.0)
    empty_loss = (-jnp.log(1.0 - occupancy) * neg).sum() / n_neg
    full_loss = (-jnp.log(occupancy) * pos).sum() / n_pos
    return empty_loss, full_loss


def classify_metrics(pred, label, threshold=0.0):
    """(precision, recall, IoU) at a threshold (reference loss.py:60-78)."""
    p = (pred > threshold).astype(jnp.float32)
    l = (label > threshold).astype(jnp.float32)
    tp = (p * l).sum()
    fp = (p * (1.0 - l)).sum()
    fn = ((1.0 - p) * l).sum()
    precision = tp / jnp.maximum(tp + fp, 1e-9)
    recall = tp / jnp.maximum(tp + fn, 1e-9)
    iou = tp / jnp.maximum(tp + fp + fn, 1e-9)
    return precision, recall, iou


def focal_loss(y_pred, y_true, gamma=2.0, alpha=0.9):
    """Focal loss on probabilities (reference loss.py:83-93)."""
    pt_1 = jnp.where(y_true == 1, y_pred, jnp.ones_like(y_pred))
    pt_0 = jnp.where(y_true == 0, y_pred, jnp.zeros_like(y_pred))
    pt_1 = jnp.clip(pt_1, 1e-3, 0.999)
    pt_0 = jnp.clip(pt_0, 1e-3, 0.999)
    return (-(alpha * (1.0 - pt_1) ** gamma * jnp.log(pt_1)).sum()
            - ((1 - alpha) * pt_0 ** gamma * jnp.log(1.0 - pt_0)).sum())


def bpp_from_likelihoods(likelihoods, num_points):
    """bits-per-(occupied input)point: sum log lik / (-ln2 * n)."""
    return jnp.sum(jnp.log(likelihoods)) / (-jnp.log(2.0) * num_points)
