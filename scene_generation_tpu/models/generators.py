"""Generator-side networks (flax, NHWC).

Reference: ``scene_generation/generators.py`` — ``mask_net`` (:16-28),
``AppearanceEncoder`` (:31-48), ``GlobalGenerator`` (:62-91, pix2pixHD-style
refiner) — plus the weight-init scheme of ``weights_init`` (:7-13).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from scene_generation_tpu.models.layers import (
    CNN, MaskedBatchNorm, conv_init_gan, global_avg_pool, instance_norm,
    reflect_pad_2d, relu, ResnetBlock)


class MaskNet(nn.Module):
    """Per-object mask generator (generators.py:16-28).

    Input (B, dim) vectors viewed as 1x1 maps; repeated [x2 nearest upsample,
    3x3 conv, BN, ReLU] until ``mask_size``, then 1x1 conv to 1 channel.
    Caller applies sigmoid (model.py:107). BN is masked by object validity.
    """
    dim: int
    mask_size: int
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True,
                 weights: Optional[jax.Array] = None) -> jax.Array:
        size = 1
        h = x[:, None, None, :]  # (B, 1, 1, dim)
        if self.mask_size & (self.mask_size - 1):
            raise ValueError("Mask size must be a power of 2")
        while size < self.mask_size:
            h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
            h = nn.Conv(self.dim, (3, 3), padding="SAME",
                        kernel_init=conv_init_gan, dtype=self.dtype)(h)
            h = MaskedBatchNorm(dtype=self.dtype)(
                h, weights=weights, use_running_average=not train)
            h = relu(h)
            size *= 2
        h = nn.Conv(1, (1, 1), kernel_init=conv_init_gan, dtype=self.dtype)(h)
        return h[..., 0]  # (B, M, M) logits


class AppearanceEncoder(nn.Module):
    """Object-crop appearance encoder (generators.py:31-48).

    CNN 'C4-64-2,C4-128-2,C4-256-2' (valid padding, masked BN,
    leakyrelu-0.2) + global average pool + Dense -> ``vecs_size``.
    """
    arch: str = "C4-64-2,C4-128-2,C4-256-2"
    normalization: str = "batch"
    activation: str = "leakyrelu-0.2"
    padding: str = "valid"
    vecs_size: int = 192
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, crops: jax.Array, train: bool = True,
                 weights: Optional[jax.Array] = None) -> jax.Array:
        h = CNN(self.arch, normalization=self.normalization,
                activation=self.activation, padding=self.padding,
                pooling="avg", dtype=self.dtype)(crops, train=train,
                                                 weights=weights)
        h = global_avg_pool(h)
        return nn.Dense(self.vecs_size, dtype=self.dtype)(h)


class GlobalGenerator(nn.Module):
    """pix2pixHD global generator (generators.py:62-91).

    layout (N, H, W, input_nc) -> reflect-pad 7x7 conv ngf -> n_downsampling
    stride-2 convs (channel doubling) -> n_blocks ResnetBlocks -> mirrored
    transpose-conv upsampling -> reflect-pad 7x7 conv -> tanh. InstanceNorm
    (affine=False) + ReLU throughout.
    """
    output_nc: int = 3
    ngf: int = 64
    n_downsampling: int = 4
    n_blocks: int = 9
    # scan=True compiles the resblock body once (6x faster full-model
    # compiles; default for training); scan=False unrolls for ~10% more
    # runtime throughput (serving).
    scan_blocks: bool = True
    # Rematerialize resblock activations in the backward pass: trades
    # ~1/3 more resblock FLOPs for O(1) instead of O(n_blocks) activation
    # memory at the 1024-channel bottleneck — the training memory peak
    # (SURVEY.md §7 "donated buffers ... memory peak").
    remat: bool = False
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = reflect_pad_2d(x, 3)
        h = nn.Conv(self.ngf, (7, 7), padding="VALID",
                    kernel_init=conv_init_gan, dtype=self.dtype)(h)
        h = relu(instance_norm(h))

        for i in range(self.n_downsampling):
            mult = 2 ** i
            h = nn.Conv(self.ngf * mult * 2, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), kernel_init=conv_init_gan,
                        dtype=self.dtype)(h)
            h = relu(instance_norm(h))

        # The n_blocks resblocks are identical in shape: scan over stacked
        # params so XLA traces/compiles the block body ONCE (an unrolled
        # 9-block chain made full-model compiles pathologically slow).
        mult = 2 ** self.n_downsampling
        if self.scan_blocks:
            class _Body(nn.Module):
                features: int
                dtype: Optional[object] = None

                @nn.compact
                def __call__(self, carry, _):
                    return ResnetBlock(self.features, dtype=self.dtype,
                                       name="block")(carry), None

            body = nn.remat(_Body) if self.remat else _Body
            scanned = nn.scan(body, variable_axes={"params": 0},
                              split_rngs={"params": True},
                              length=self.n_blocks)
            h, _ = scanned(self.ngf * mult, dtype=self.dtype,
                           name="resblocks")(h, None)
        else:
            for i in range(self.n_blocks):
                h = ResnetBlock(self.ngf * mult, dtype=self.dtype,
                                name=f"resblock_{i}")(h)

        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            h = nn.ConvTranspose(self.ngf * mult // 2, (3, 3), strides=(2, 2),
                                 padding="SAME", kernel_init=conv_init_gan,
                                 dtype=self.dtype)(h)
            h = relu(instance_norm(h))

        h = reflect_pad_2d(h, 3)
        h = nn.Conv(self.output_nc, (7, 7), padding="VALID",
                    kernel_init=conv_init_gan, dtype=self.dtype)(h)
        return jnp.tanh(h)
