"""Pin the three host-pipeline parity semantics fixed in round 3:
inception split boundaries, deprocess min-max rescale, and the
per-family mask re-binarization threshold (instances 128 / panoptic 127).
"""
import numpy as np

from scene_generation_tpu.data.image_utils import deprocess, resize_mask
from scene_generation_tpu.trainer.evaluation import inception_score_from_probs


def test_inception_splits_drop_remainder_like_reference():
    rng = np.random.RandomState(0)
    probs = rng.dirichlet(np.ones(10), size=23).astype(np.float32)
    mean, std = inception_score_from_probs(probs, splits=5)

    # Reference re-enactment (inception_score.py:47-61): k*(N//splits)
    # chunks, N % splits images dropped.
    n = 23 // 5
    ref_scores = []
    for k in range(5):
        part = probs[k * n:(k + 1) * n]
        py = part.mean(axis=0, keepdims=True)
        kl = part * (np.log(part + 1e-12) - np.log(py + 1e-12))
        ref_scores.append(np.exp(kl.sum(axis=1).mean()))
    assert abs(mean - np.mean(ref_scores)) < 1e-6
    assert abs(std - np.std(ref_scores)) < 1e-6


def test_inception_fewer_images_than_splits_is_finite():
    probs = np.full((3, 10), 0.1, np.float32)
    mean, _ = inception_score_from_probs(probs, splits=5)
    assert np.isfinite(mean)


def test_deprocess_rescales_to_full_range():
    # Image spanning a sub-range must be contrast-stretched to [0, 255]
    # (reference imagenet_deprocess_batch rescale=True, data/utils.py:17-28).
    img = np.linspace(-0.6, 0.4, 48, dtype=np.float32).reshape(4, 4, 3)
    out = deprocess(img)
    assert out.min() == 0 and out.max() == 255
    # Monotone: ordering preserved by the affine stretch.
    flat_in, flat_out = img.reshape(-1), out.reshape(-1).astype(np.int32)
    assert (np.diff(flat_out[np.argsort(flat_in)]) >= 0).all()
    # rescale=False keeps the old clip behavior.
    clipped = deprocess(img, rescale=False)
    assert clipped.max() < 255
    # Constant image: guarded (reference would divide by zero).
    assert np.isfinite(deprocess(np.zeros((4, 4, 3), np.float32))).all()


def test_mask_threshold_per_family():
    from scene_generation_tpu.data.coco import CocoSceneGraphDataset
    from scene_generation_tpu.data.coco_panoptic import (
        CocoPanopticSceneGraphDataset)
    assert CocoSceneGraphDataset._mask_threshold == 128
    assert CocoPanopticSceneGraphDataset._mask_threshold == 127
    # A resized value landing exactly on 128 flips only for panoptic.
    mask = np.zeros((4, 4), np.uint8)
    mask[:2] = 1  # bilinear midpoints at the boundary hit ~127.5-128
    r128 = resize_mask(mask, 8, threshold=128)
    r127 = resize_mask(mask, 8, threshold=127)
    assert r127.sum() >= r128.sum()
