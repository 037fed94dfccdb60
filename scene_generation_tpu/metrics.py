"""Box metrics (reference ``scene_generation/metrics.py:20-35``)."""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def intersection(bbox_pred: jax.Array, bbox_gt: jax.Array) -> jax.Array:
    """Elementwise box intersection area (metrics.py:20-24)."""
    max_xy = jnp.minimum(bbox_pred[..., 2:], bbox_gt[..., 2:])
    min_xy = jnp.maximum(bbox_pred[..., :2], bbox_gt[..., :2])
    inter = jnp.clip(max_xy - min_xy, 0.0, None)
    return inter[..., 0] * inter[..., 1]


def jaccard(bbox_pred: jax.Array, bbox_gt: jax.Array,
            mask: Optional[jax.Array] = None
            ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(sum IoU, #IoU>0.5, #IoU>0.3) over (optionally masked) boxes.

    Reference ``jaccard`` (metrics.py:27-35); ``mask`` excludes padding and,
    as in evaluation, the __image__ rows (sample_images.py:241-249).
    """
    inter = intersection(bbox_pred, bbox_gt)
    area_pred = ((bbox_pred[..., 2] - bbox_pred[..., 0])
                 * (bbox_pred[..., 3] - bbox_pred[..., 1]))
    area_gt = ((bbox_gt[..., 2] - bbox_gt[..., 0])
               * (bbox_gt[..., 3] - bbox_gt[..., 1]))
    union = area_pred + area_gt - inter
    iou = inter / jnp.where(union == 0, 1.0, union)
    if mask is not None:
        iou = iou * mask
        valid = mask
    else:
        valid = jnp.ones_like(iou)
    return (jnp.sum(iou),
            jnp.sum((iou > 0.5) * valid),
            jnp.sum((iou > 0.3) * valid))
