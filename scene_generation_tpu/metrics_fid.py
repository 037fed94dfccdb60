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


def create_shallow_features_fn(seed: int = 0):
    """Fixed-seed shallow random-CNN feature extractor (fallback when no
    pretrained InceptionV3 weights are installed).

    A *deep* random-init network (48 conv layers) washes out input
    dependence — pool3 features come out constant across images (std
    ~3e-6), so FID degenerates to exactly 0. Four He-init conv layers with
    leaky-ReLU keep features input-dependent; mean-pooled taps after every
    layer give a 960-d descriptor. Random-feature FID is relative-only but
    rank-correlates with real FID (Naeem et al. 2020 report random-feature
    metrics preserve fidelity orderings).
    """
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(seed)
    chans = [3, 64, 128, 256, 512]
    kernels = []
    for i in range(4):
        key, k = jax.random.split(key)
        fan_in = 3 * 3 * chans[i]
        kernels.append(jax.random.normal(k, (3, 3, chans[i], chans[i + 1]),
                                         jnp.float32)
                       * jnp.sqrt(2.0 / fan_in))

    @jax.jit
    def features_fn(imgs):
        x = jnp.asarray(imgs, jnp.float32)
        taps = []
        for w in kernels:
            x = jax.lax.conv_general_dilated(
                x, w, window_strides=(2, 2), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jax.nn.leaky_relu(x, 0.2)
            taps.append(x.mean(axis=(1, 2)))
        return jnp.concatenate(taps, axis=-1)

    return features_fn


class FIDAccumulator:
    """Streams real/fake batches through InceptionV3 pool3 features."""

    def __init__(self, features_fn=None):
        if features_fn is None:
            from scene_generation_tpu.models.inception import (
                _torch_checkpoint_path, create_inception_features_fn)
            if _torch_checkpoint_path() is None:
                # Skip the (costly) InceptionV3 init entirely when no
                # weight file exists — its random-init features are
                # degenerate anyway (constant across images).
                print("[metrics_fid] WARNING: no InceptionV3 weights; "
                      "falling back to a shallow fixed-seed random-CNN "
                      "extractor — FID values are relative-only")
                features_fn = create_shallow_features_fn()
            else:
                features_fn, loaded = create_inception_features_fn()
                if not loaded:  # present but unreadable file
                    print("[metrics_fid] WARNING: InceptionV3 weight file "
                          "found but not loadable; using the shallow "
                          "random-CNN fallback")
                    features_fn = create_shallow_features_fn()
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
