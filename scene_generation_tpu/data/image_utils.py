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


def deprocess(img: np.ndarray) -> np.ndarray:
    """[-1, 1] float -> uint8 (reference imagenet_deprocess_batch,
    data/utils.py:32-51); uint8 wire-format input passes through."""
    if img.dtype == np.uint8:
        return img
    arr = np.clip(img * STD + MEAN, 0.0, 1.0)
    return (arr * 255).astype(np.uint8)


def resize_mask(mask: np.ndarray, size: int) -> np.ndarray:
    """Resize a binary mask to (size, size) and re-binarize.

    Reference: skimage anti-aliased resize of 255*mask then > 128 threshold
    (coco.py:308-309); PIL bilinear approximates the anti-aliased resize.
    """
    im = PIL.Image.fromarray((mask * 255).astype(np.uint8))
    arr = np.asarray(im.resize((size, size), PIL.Image.BILINEAR),
                     np.float32)
    return (arr > 128).astype(np.int64)
