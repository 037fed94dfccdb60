"""The three discriminators (flax, NHWC).

Reference: ``scene_generation/discriminators.py`` —
``AcDiscriminator``/``AcCropDiscriminator`` (:10-51),
``MultiscaleDiscriminator``/``NLayerDiscriminator`` (:172-245, pix2pixHD
PatchGAN returning all intermediate features for feature matching),
``MultiscaleMaskDiscriminator``/``NLayerMaskDiscriminator`` (:87-169,
class-conditional 32x32 mask PatchGAN).
"""
from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from scene_generation_tpu.models.layers import (
    CNN, avg_pool_3x3_s2, conv_init_gan, get_activation, global_avg_pool,
    instance_norm)
from scene_generation_tpu.ops.crop import crop_bbox_batch


class AcDiscriminator(nn.Module):
    """Object-crop real/fake + auxiliary classifier (discriminators.py:10-36).

    Returns (real_scores (B, 1), obj_logits (B, num_objects)); the AC
    cross-entropy is computed (masked) in losses.py rather than inside the
    module as the reference does (discriminators.py:35).
    """
    num_objects: int
    arch: str = "C4-64-2,C4-128-2,C4-256-2"
    normalization: str = "batch"
    activation: str = "leakyrelu-0.2"
    padding: str = "valid"
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, crops: jax.Array, train: bool = True,
                 weights: Optional[jax.Array] = None):
        h = CNN(self.arch, normalization=self.normalization,
                activation=self.activation, padding=self.padding,
                pooling="avg", dtype=self.dtype)(crops, train=train,
                                                 weights=weights)
        vecs = nn.Dense(1024, dtype=self.dtype)(global_avg_pool(h))
        real_scores = nn.Dense(1, dtype=self.dtype)(vecs)
        obj_logits = nn.Dense(self.num_objects, dtype=self.dtype)(vecs)
        return real_scores, obj_logits


class AcCropDiscriminator(nn.Module):
    """Crops objects then applies AcDiscriminator (discriminators.py:39-51).

    Operates on the padded (N, O) contract: crops every object slot; the
    validity mask feeds the masked BN and the downstream losses.
    """
    num_objects: int
    object_size: int = 32
    arch: str = "C4-64-2,C4-128-2,C4-256-2"
    normalization: str = "batch"
    activation: str = "leakyrelu-0.2"
    padding: str = "valid"
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, imgs: jax.Array, boxes: jax.Array,
                 obj_mask: jax.Array, train: bool = True):
        n, o = boxes.shape[:2]
        crops = crop_bbox_batch(imgs, boxes, self.object_size)
        flat = crops.reshape(n * o, self.object_size, self.object_size,
                             crops.shape[-1])
        w = obj_mask.reshape(n * o)
        scores, logits = AcDiscriminator(
            num_objects=self.num_objects, arch=self.arch,
            normalization=self.normalization, activation=self.activation,
            padding=self.padding, dtype=self.dtype, name="discriminator")(
                flat, train=train, weights=w)
        return (scores.reshape(n, o), logits.reshape(n, o, -1), crops)


class NLayerDiscriminator(nn.Module):
    """PatchGAN (discriminators.py:206-245): 4x4 convs, stride 2 for the
    first n_layers, then two stride-1 stages; returns per-stage features."""
    ndf: int = 64
    n_layers: int = 3
    norm: str = "instance"
    use_sigmoid: bool = False
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        act = get_activation("leakyrelu-0.2")

        def normalize(h):
            return instance_norm(h) if self.norm == "instance" else h

        feats = []
        nf = self.ndf
        h = nn.Conv(nf, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)),
                    kernel_init=conv_init_gan, dtype=self.dtype)(x)
        h = act(h)
        feats.append(h)
        for _ in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            h = nn.Conv(nf, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)),
                        kernel_init=conv_init_gan, dtype=self.dtype)(h)
            h = act(normalize(h))
            feats.append(h)
        nf = min(nf * 2, 512)
        h = nn.Conv(nf, (4, 4), strides=(1, 1), padding=((2, 2), (2, 2)),
                    kernel_init=conv_init_gan, dtype=self.dtype)(h)
        h = act(normalize(h))
        feats.append(h)
        h = nn.Conv(1, (4, 4), strides=(1, 1), padding=((2, 2), (2, 2)),
                    kernel_init=conv_init_gan, dtype=self.dtype)(h)
        if self.use_sigmoid:
            h = jax.nn.sigmoid(h)
        feats.append(h)
        return feats


class MultiscaleDiscriminator(nn.Module):
    """num_D PatchGANs over progressively avg-pooled inputs
    (discriminators.py:172-202). Returns a list (one per scale) of
    per-stage feature lists; element [-1] of each is the patch score map."""
    ndf: int = 64
    n_layers: int = 3
    norm: str = "instance"
    use_sigmoid: bool = False
    num_d: int = 2
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> List[List[jax.Array]]:
        results = []
        h = x
        for i in range(self.num_d):
            scale = self.num_d - 1 - i  # reference iterates scales in reverse
            results.append(NLayerDiscriminator(
                ndf=self.ndf, n_layers=self.n_layers, norm=self.norm,
                use_sigmoid=self.use_sigmoid, dtype=self.dtype,
                name=f"scale_{scale}")(h))
            if i != self.num_d - 1:
                h = avg_pool_3x3_s2(h)
        return results


class NLayerMaskDiscriminator(nn.Module):
    """Class-conditional mask PatchGAN (discriminators.py:128-169):
    3x3 convs; the one-hot class vector is broadcast spatially and
    concatenated before the penultimate conv (discriminators.py:107-110)."""
    ndf: int = 64
    n_layers: int = 2
    norm: str = "instance"
    use_sigmoid: bool = False
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x: jax.Array, cond: jax.Array) -> List[jax.Array]:
        act = get_activation("leakyrelu-0.2")

        def normalize(h):
            return instance_norm(h) if self.norm == "instance" else h

        feats = []
        nf = self.ndf
        h = nn.Conv(nf, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    kernel_init=conv_init_gan, dtype=self.dtype)(x)
        h = act(h)
        feats.append(h)
        for _ in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            h = nn.Conv(nf, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        kernel_init=conv_init_gan, dtype=self.dtype)(h)
            h = act(normalize(h))
            feats.append(h)
        # Concatenate the spatially-broadcast condition.
        b, hh, ww, _ = h.shape
        c = jnp.broadcast_to(cond[:, None, None, :], (b, hh, ww, cond.shape[-1]))
        h = jnp.concatenate([h, c.astype(h.dtype)], axis=-1)
        nf = min(nf * 2, 512)
        h = nn.Conv(nf, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                    kernel_init=conv_init_gan, dtype=self.dtype)(h)
        h = act(normalize(h))
        feats.append(h)
        h = nn.Conv(1, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                    kernel_init=conv_init_gan, dtype=self.dtype)(h)
        if self.use_sigmoid:
            h = jax.nn.sigmoid(h)
        feats.append(h)
        return feats


class MultiscaleMaskDiscriminator(nn.Module):
    """Multi-scale wrapper over NLayerMaskDiscriminator
    (discriminators.py:87-124); num_D=1 by default (args.py:90)."""
    ndf: int = 64
    n_layers: int = 2
    norm: str = "instance"
    use_sigmoid: bool = False
    num_d: int = 1
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x: jax.Array, cond: jax.Array) -> List[List[jax.Array]]:
        results = []
        h = x
        for i in range(self.num_d):
            scale = self.num_d - 1 - i
            results.append(NLayerMaskDiscriminator(
                ndf=self.ndf, n_layers=self.n_layers, norm=self.norm,
                use_sigmoid=self.use_sigmoid, dtype=self.dtype,
                name=f"scale_{scale}")(h, cond))
            if i != self.num_d - 1:
                h = avg_pool_3x3_s2(h)
        return results
