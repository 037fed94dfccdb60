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

    Init divergence (documented): convs here use N(0, 0.02); the reference
    builds mask_net OUTSIDE define_G (model.py:69), so weights_init never
    touches it and its convs keep the torch default (kaiming-uniform).
    All committed training evidence used this init.
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


class StemConv(nn.Module):
    """7x7 VALID conv with an optional FACTORED evaluation path.

    Parameter tree is identical to ``nn.Conv`` ({kernel, bias}) so
    checkpoints are interchangeable with the plain-conv stem; the dense
    path reproduces ``nn.Conv`` exactly (NHWC/HWIO correlation + bias).

    The factored path exploits that the composed layout is rank-O in the
    object axis (``ops/layout.py masks_to_layout_weights``):
    ``layout[n,y,x,:] = sum_o w[n,y,x,o] * F[n,o,:]``. The stem conv is
    linear in the layout, so

        conv(layout)[n,y,x,c] = sum_{q,o} w[n,y+q,x+q',o] * g[n,o,q,q',c],
        g[n,o,q,q',c]        = sum_d F[n,o,d] * kernel[q,q',d,c]

    — a tiny per-object matmul (O x D x 49C per image) followed by a 7x7
    conv whose input has O (=9) channels instead of D (=204): a D/O ~22x
    FLOP and HBM reduction over convolving the materialized layout, with
    identical semantics up to float reassociation. The reference pays the
    dense form (pix2pixHD stem on the one-hot layout, generators.py:70-71
    + model.py:164-168); nothing in its semantics requires it.

    Factored impls (all mathematically identical; picked by measurement —
    scripts/stem_microbench.py, 1x v5e bf16, 2026-08-17; stem-only ms at
    b16/b64/b128, dense conv = 5.5/22.1/26.3):
      'pallas': fused VMEM kernel (ops/pallas/stem.py) — 0.84/4.2/10.2.
        NOT differentiable; serving/test only.
      'patches': im2col of the O-channel weight field
        (conv_general_dilated_patches -> (N,H,W,49O)) + ONE per-image
        K=441 matmul against g — 2.1/6.9/18.3. The im2col tensor is over
        O=9 channels, not D=204, so it stays ~22x smaller than dense
        im2col; the matmul has a full MXU contraction dim. Autodiffs —
        the TRAIN default.
      'slices': same matmul, im2col via 49 explicit slice+concat —
        5.6/24.7/56.6 (the copies do not fuse).
      'grouped': vmapped per-image conv — XLA lowers to a grouped conv
        whose 9-channel groups pad catastrophically on TPU (measured
        SLOWER than dense: 64 vs 26 ms at b128).
      'shifts': 49 statically-shifted (HW, O) x (O, C) matmuls — the f32
        accumulator re-materializes 49x (measured 85 ms at b128).
    """
    features: int
    kernel_size: int = 7
    factored_impl: str = "patches"
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x: Optional[jax.Array] = None, *,
                 weights: Optional[jax.Array] = None,
                 vecs: Optional[jax.Array] = None,
                 impl: Optional[str] = None) -> jax.Array:
        k = self.kernel_size
        in_ch = x.shape[-1] if x is not None else vecs.shape[-1]
        kernel = self.param("kernel", conv_init_gan,
                            (k, k, in_ch, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dn = ("NHWC", "HWIO", "NHWC")
        if x is not None:
            x, kernel, bias = nn.dtypes.promote_dtype(
                x, kernel, bias, dtype=self.dtype)
            out = jax.lax.conv_general_dilated(x, kernel, (1, 1), "VALID",
                                               dimension_numbers=dn)
            return out + bias
        # Factored path: weights (N, Hp, Wp, O) already spatially padded by
        # the caller (padding commutes with the per-pixel contraction),
        # vecs (N, O, D).
        impl = impl or self.factored_impl
        weights, vecs, kernel, bias = nn.dtypes.promote_dtype(
            weights, vecs, kernel, bias, dtype=self.dtype)
        g = jnp.einsum("nod,hwdc->nhwoc", vecs, kernel,
                       preferred_element_type=weights.dtype)  # (N,7,7,O,C)
        if impl in ("pallas", "pallas_interpret"):
            # Fused VMEM-resident contraction (ops/pallas/stem.py): no HBM
            # im2col. NOT differentiable — serving/test path only; the
            # train path uses 'patches' (plain XLA, autodiffs).
            from scene_generation_tpu.ops.pallas.stem import stem_pallas
            out = stem_pallas(
                weights, g,
                interpret=impl == "pallas_interpret")
        elif impl == "patches":
            n, _, _, o = weights.shape
            # (N, Hout, Wout, O*k*k); feature order (c_in, ky, kx) per
            # conv_general_dilated_patches' contract.
            patches = jax.lax.conv_general_dilated_patches(
                weights, (k, k), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            g_okk = jnp.transpose(g, (0, 3, 1, 2, 4)).reshape(
                n, o * k * k, self.features)
            out = jnp.einsum("nhwq,nqc->nhwc", patches, g_okk,
                             preferred_element_type=weights.dtype)
        elif impl == "slices":
            # im2col via k*k static shifted slices (plain copies — avoids
            # conv_general_dilated_patches' grouped-conv lowering), then
            # the same per-image K=441 matmul.
            n, hp, wp_, o = weights.shape
            h_out, w_out = hp - k + 1, wp_ - k + 1
            pieces = [weights[:, dy:dy + h_out, dx:dx + w_out, :]
                      for dy in range(k) for dx in range(k)]
            patches = jnp.concatenate(pieces, axis=-1)  # (N,H,W,k*k*O)
            g_kko = jnp.reshape(g, (n, k * k * o, self.features))
            out = jnp.einsum("nhwq,nqc->nhwc", patches, g_kko,
                             preferred_element_type=weights.dtype)
        elif impl == "grouped":
            def one(wm, gk):
                return jax.lax.conv_general_dilated(
                    wm[None], gk, (1, 1), "VALID",
                    dimension_numbers=dn)[0]
            out = jax.vmap(one)(weights, g)
        elif impl == "shifts":
            n, hp, wp, _ = weights.shape
            h_out, w_out = hp - k + 1, wp - k + 1
            acc = jnp.zeros((n, h_out, w_out, self.features), jnp.float32)
            for qy in range(k):
                for qx in range(k):
                    sl = jax.lax.slice(
                        weights, (0, qy, qx, 0),
                        (n, qy + h_out, qx + w_out, weights.shape[-1]))
                    acc = acc + jnp.einsum(
                        "nhwo,noc->nhwc", sl, g[:, qy, qx],
                        preferred_element_type=jnp.float32)
            out = acc.astype(weights.dtype)
        else:
            raise ValueError(f"unknown factored_impl {impl!r}")
        return out + bias


class GlobalGenerator(nn.Module):
    """pix2pixHD global generator (generators.py:62-91).

    layout (N, H, W, input_nc) -> reflect-pad 7x7 conv ngf -> n_downsampling
    stride-2 convs (channel doubling) -> n_blocks ResnetBlocks -> mirrored
    transpose-conv upsampling -> reflect-pad 7x7 conv -> tanh. InstanceNorm
    (affine=False) + ReLU throughout.

    Accepts EITHER a materialized layout ``x`` or the layout's rank-O
    factorization (``layout_weights`` (N, H, W, O) + ``layout_vecs``
    (N, O, D)) — the latter routes the stem through ``StemConv``'s factored
    path (~22x fewer stem FLOPs, identical math; see StemConv docstring).
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
    # torch_deconv=True makes each upsample bit-match the reference's
    # ConvTranspose2d(k=3, s=2, p=1, output_padding=1): explicit
    # ((1,2),(1,2)) padding + transpose_kernel (flipped spatial taps,
    # (kh, kw, OUT, IN) param layout — kernel = torch_weight.transpose(
    # 2, 3, 1, 0)). The False default keeps flax's 'SAME' transpose conv —
    # same shapes, but a one-pixel-shifted, unflipped variant the
    # in-framework training absorbs; existing checkpoints were trained
    # with it. Use True when porting reference generator weights
    # (pinned by tests/test_torch_deconv.py).
    torch_deconv: bool = False
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x: Optional[jax.Array] = None, *,
                 layout_weights: Optional[jax.Array] = None,
                 layout_vecs: Optional[jax.Array] = None,
                 stem_impl: Optional[str] = None) -> jax.Array:
        # Explicit submodule names keep the param tree identical to the
        # historical auto-named layout (Conv_0..Conv_5) regardless of which
        # stem path traces first — checkpoints stay interchangeable.
        stem = StemConv(self.ngf, kernel_size=7, dtype=self.dtype,
                        name="Conv_0")
        if x is not None:
            h = stem(reflect_pad_2d(x, 3))
        else:
            h = stem(weights=reflect_pad_2d(layout_weights, 3),
                     vecs=layout_vecs, impl=stem_impl)
        h = relu(instance_norm(h))

        for i in range(self.n_downsampling):
            mult = 2 ** i
            h = nn.Conv(self.ngf * mult * 2, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), kernel_init=conv_init_gan,
                        dtype=self.dtype, name=f"Conv_{i + 1}")(h)
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
            # remat applies per-block here too: each unrolled block's
            # interior activations are recomputed in the bwd pass instead
            # of living in HBM across the whole fwd (A/B'd in RESULTS §42).
            block_cls = nn.remat(ResnetBlock) if self.remat else ResnetBlock
            for i in range(self.n_blocks):
                h = block_cls(self.ngf * mult, dtype=self.dtype,
                              name=f"resblock_{i}")(h)

        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            deconv_kw = (dict(padding=((1, 2), (1, 2)), transpose_kernel=True)
                         if self.torch_deconv else dict(padding="SAME"))
            h = nn.ConvTranspose(self.ngf * mult // 2, (3, 3), strides=(2, 2),
                                 kernel_init=conv_init_gan,
                                 dtype=self.dtype, **deconv_kw)(h)
            h = relu(instance_norm(h))

        h = reflect_pad_2d(h, 3)
        h = nn.Conv(self.output_nc, (7, 7), padding="VALID",
                    kernel_init=conv_init_gan, dtype=self.dtype,
                    name=f"Conv_{self.n_downsampling + 1}")(h)
        return jnp.tanh(h)
