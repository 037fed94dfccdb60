"""Training-time evaluation (reference ``check_model``, train.py:80-116).

Runs the model in test mode over the val loader twice — with GT layout
(use_gt) and from the scene graph alone — reporting box IoU (jaccard) and
Inception score. The inception classifier is pluggable: pass a callable
``probs_fn(imgs_float_minus1_1) -> (N, K) softmax`` (see models/inception).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scene_generation_tpu.data.batching import Batch
from scene_generation_tpu.metrics import jaccard
from scene_generation_tpu.trainer.train_state import Modules, TrainState


def make_eval_step(mods: Modules, use_gt: bool):
    # Cache per (mods, use_gt): check_model runs every checkpoint interval
    # and must not recompile each time.
    cache = getattr(mods, "_eval_step_cache", None)
    if cache is None:
        cache = {}
        mods._eval_step_cache = cache
    if use_gt in cache:
        return cache[use_gt]
    mc = mods.cfg.model

    @jax.jit
    def eval_step(state: TrainState, batch: Batch, noise: jax.Array):
        attributes = jnp.asarray(batch.attributes)
        if not use_gt:
            attributes = jnp.zeros_like(attributes)
        out = mods.model.apply(
            {"params": state.g_params, "batch_stats": state.g_stats},
            jnp.asarray(batch.objs), jnp.asarray(batch.triples), attributes,
            jnp.asarray(batch.obj_mask), jnp.asarray(batch.triple_mask),
            noise, imgs=jnp.asarray(batch.imgs),
            boxes_gt=jnp.asarray(batch.boxes),
            masks_gt=jnp.asarray(batch.masks) if use_gt else None,
            test_mode=True, use_gt_box=use_gt, train=False)
        # IoU excludes __image__ rows (sample_images.py:241-249).
        mask = jnp.asarray(batch.obj_mask) * (jnp.asarray(batch.objs) != 0)
        iou_sum, r05, r03 = jaccard(out.boxes_pred, jnp.asarray(batch.boxes),
                                    mask)
        return out.imgs_pred, iou_sum, r05, r03, jnp.sum(mask)

    cache[use_gt] = eval_step
    return eval_step


def inception_score_from_probs(probs: np.ndarray,
                               splits: int = 5) -> Tuple[float, float]:
    """exp(mean KL(p(y|x) || p(y))) per split (inception_score.py:47-61).

    Split boundaries match the reference exactly: ``splits`` chunks of
    N // splits images, DROPPING the N % splits remainder (the reference's
    ``preds[k*(N//splits):(k+1)*(N//splits)]``) — folding the remainder in
    changed per-split p(y) for any N not divisible by splits."""
    n = probs.shape[0] // splits
    if n == 0:
        # Fewer images than splits (tiny smoke runs): score one split
        # instead of NaN-ing like the reference formula would.
        n = max(probs.shape[0], 1)
    scores = []
    for i in range(splits):
        part = probs[i * n:(i + 1) * n]
        if len(part) == 0:
            continue
        py = part.mean(axis=0, keepdims=True)
        kl = part * (np.log(part + 1e-12) - np.log(py + 1e-12))
        scores.append(float(np.exp(kl.sum(axis=1).mean())))
    return float(np.mean(scores)), float(np.std(scores))


def check_model(mods: Modules, state: TrainState, loader, use_gt: bool,
                num_samples: int,
                probs_fn: Optional[Callable] = None,
                rng: Optional[jax.Array] = None,
                splits: int = 5):
    """-> (avg_iou, inception_mean, inception_std, recall05, recall03)."""
    eval_step = make_eval_step(mods, use_gt)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    total_iou = total_boxes = total_r05 = total_r03 = 0.0
    seen = 0
    all_probs = []
    for batch in loader:
        rng, r = jax.random.split(rng)
        noise = jax.random.normal(r, (mods.cfg.model.mask_noise_dim,))
        imgs_pred, iou_sum, r05, r03, nbox = eval_step(state, batch, noise)
        # ONE host transfer for the four scalars: per-key float() pays a
        # full round trip each over remote links (train.py print-path
        # lesson, RESULTS.md §24).
        iou_sum, r05, r03, nbox = jax.device_get((iou_sum, r05, r03, nbox))
        total_iou += float(iou_sum)
        total_r05 += float(r05)
        total_r03 += float(r03)
        total_boxes += float(nbox)
        if probs_fn is not None:
            probs = probs_fn(imgs_pred)
            if isinstance(probs, jax.Array) and not probs.is_fully_addressable:
                # Multi-host: probs is batch-sharded across all processes'
                # devices; np.asarray on it raises. All-gather the (small,
                # N x K) matrix so every process computes the SAME inception
                # score — maybe_promote_best consumes it, and divergent
                # per-process values would desynchronize best-checkpoint
                # promotion across hosts.
                from jax.experimental import multihost_utils
                # tiled=True: global batch-sharded input -> full (N, K)
                # value on every host (the only mode supported for
                # non-fully-addressable inputs).
                probs = multihost_utils.process_allgather(probs, tiled=True)
            all_probs.append(np.asarray(probs))
        seen += batch.num_images
        if seen >= num_samples:
            break
    avg_iou = total_iou / max(total_boxes, 1.0)
    if all_probs:
        imean, istd = inception_score_from_probs(
            np.concatenate(all_probs), splits)
    else:
        imean, istd = 0.0, 0.0
    return (avg_iou, imean, istd,
            total_r05 / max(total_boxes, 1.0),
            total_r03 / max(total_boxes, 1.0))
