"""Frechet Inception Distance.

The reference computes FID out-of-repo with the TTUR TensorFlow script over
dumped image directories (README.md:77-79); this module provides the same
measurement in-framework: InceptionV3 pool3 (2048-d) feature statistics +
the Frechet distance

    FID = |mu_x - mu_y|^2 + Tr(Sx + Sy - 2 (Sx Sy)^{1/2}).

Usage:
    from scene_generation_tpu.metrics_fid import FIDAccumulator
    fid = FIDAccumulator()                 # builds the feature extractor
    fid.add_real(real_imgs); fid.add_fake(fake_imgs)   # [-1,1] NHWC
    score = fid.compute()
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np


def frechet_distance(mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray,
                     sigma2: np.ndarray, eps: float = 1e-6) -> float:
    """Frechet distance between two Gaussians (numerically guarded sqrtm)."""
    import scipy.linalg

    diff = mu1 - mu2
    covmean, _ = scipy.linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm(
            (sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def _stats(feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


class FIDAccumulator:
    """Streams real/fake batches through InceptionV3 pool3 features."""

    def __init__(self, features_fn=None):
        if features_fn is None:
            from scene_generation_tpu.models.inception import (
                create_inception_features_fn)
            features_fn, loaded = create_inception_features_fn()
            if not loaded:
                print("[metrics_fid] WARNING: no InceptionV3 weights; FID "
                      "is relative-only (random-init features)")
        self.features_fn = features_fn
        self._real: List[np.ndarray] = []
        self._fake: List[np.ndarray] = []

    def add_real(self, imgs) -> None:
        self._real.append(np.asarray(self.features_fn(imgs), np.float64))

    def add_fake(self, imgs) -> None:
        self._fake.append(np.asarray(self.features_fn(imgs), np.float64))

    def compute(self) -> float:
        real = np.concatenate(self._real)
        fake = np.concatenate(self._fake)
        if len(real) < 2 or len(fake) < 2:
            raise ValueError("need >= 2 samples on each side for FID")
        return frechet_distance(*_stats(real), *_stats(fake))
