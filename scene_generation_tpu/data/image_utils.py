"""Host-side image utilities (reference ``data/utils.py``).

The reference "imagenet" normalization is actually mean/std = 0.5
(data/utils.py:6-14), i.e. images live in [-1, 1] — kept here.
"""
from __future__ import annotations

import numpy as np
import PIL.Image

MEAN = 0.5
STD = 0.5


def load_image(path: str, size) -> np.ndarray:
    """Load + resize to (H, W, 3) uint8.

    uint8 is the host->device WIRE FORMAT (4x fewer bytes across the
    PCIe/DCN boundary than the reference's f32 ``.cuda()``, train.py:192);
    normalization to [-1, 1] happens on device (ops/images.py
    wire_to_float), with identical 0.5/0.5 math."""
    with open(path, "rb") as f:
        with PIL.Image.open(f) as im:
            im = im.convert("RGB").resize((size[1], size[0]),
                                          PIL.Image.BILINEAR)
            return np.asarray(im, np.uint8)


def normalize(img: np.ndarray) -> np.ndarray:
    """uint8 -> float32 in [-1, 1] on the HOST (reference data/utils.py:6-14
    imagenet_preprocess; device-side twin is ops/images.wire_to_float)."""
    if img.dtype == np.uint8:
        return (np.asarray(img, np.float32) / 255.0 - MEAN) / STD
    return img


def deprocess(img: np.ndarray, rescale: bool = True) -> np.ndarray:
    """[-1, 1] float (one image, HWC) -> uint8 (reference
    imagenet_deprocess_batch, data/utils.py:32-51); uint8 wire-format
    input passes through.

    ``rescale=True`` (the reference default, data/utils.py:17-28) min-max
    stretches the un-normalized image to the full [0, 255] range —
    previously this clipped instead, leaving every saved/eval image
    systematically lower-contrast than the reference pipeline's.
    ``rescale=False`` gives the old clipping behavior.
    """
    if img.dtype == np.uint8:
        return img
    arr = img * STD + MEAN
    if rescale:
        lo, hi = arr.min(), arr.max()
        # Reference rescale() divides by (hi - lo) unguarded; guard the
        # constant-image edge so synthetic smoke data cannot NaN.
        arr = (arr - lo) / max(hi - lo, 1e-12)
    else:
        arr = np.clip(arr, 0.0, 1.0)
    return (arr * 255).astype(np.uint8)


def resize_mask(mask: np.ndarray, size: int,
                threshold: int = 128) -> np.ndarray:
    """Resize a binary mask to (size, size) and re-binarize.

    Reference: skimage anti-aliased resize of 255*mask then a threshold —
    ``> 128`` for instances (coco.py:308-309) but ``> 127`` for panoptic
    (coco_panoptic.py:355); PIL bilinear approximates the anti-aliased
    resize, and callers pass the family's threshold.
    """
    im = PIL.Image.fromarray((mask * 255).astype(np.uint8))
    arr = np.asarray(im.resize((size, size), PIL.Image.BILINEAR),
                     np.float32)
    return (arr > threshold).astype(np.int64)
