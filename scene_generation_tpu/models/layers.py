"""NN building blocks (flax.linen, NHWC).

TPU-native counterpart of the reference toolkit (``scene_generation/layers.py``):
the ``build_cnn`` string DSL (layers.py:128-212), ``build_mlp``
(layers.py:215-231), pix2pixHD ``ResnetBlock`` (layers.py:234-273) and the
norm/activation factories (layers.py:23-47,292-301).

Conventions:
  * NHWC everywhere (TPU-preferred); the reference is NCHW.
  * InstanceNorm matches torch ``nn.InstanceNorm2d`` defaults: affine=False,
    eps=1e-5, always instance statistics.
  * BatchNorm is *masked*: under the padded object contract, junk slots must
    not pollute batch statistics, so stats are weighted by a per-sample
    validity weight. With all-ones weights it reduces to standard BN
    (torch momentum semantics, running stats for eval).
  * Activation strings reproduce the reference quirk that ``get_activation``
    maps EVERY name to LeakyReLU (layers.py:40), with slope parsed from
    'leakyrelu-S' and torch's default 0.01 otherwise.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def get_activation(name: str) -> Callable[[jax.Array], jax.Array]:
    """Activation factory; reference layers.py:34-47 (always LeakyReLU)."""
    slope = 0.01
    if name and name.lower().startswith("leakyrelu") and "-" in name:
        slope = float(name.split("-")[1])
    return lambda x: jax.nn.leaky_relu(x, negative_slope=slope)


def relu(x: jax.Array) -> jax.Array:
    return jax.nn.relu(x)


def reflect_pad_2d(x: jax.Array, pad: int) -> jax.Array:
    """ReflectionPad2d on NHWC (reference uses it around 7x7/3x3 convs)."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """InstanceNorm2d(affine=False) on NHWC; torch semantics (layers.py:25)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def global_avg_pool(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, C); reference GlobalAvgPool (layers.py:82-85)."""
    return jnp.mean(x, axis=(1, 2))


# Initializers. Reference scope of weights_init (normal(0, 0.02) convs):
# it is applied ONLY through define_G / define_D / define_mask_D
# (generators.py:56, discriminators.py:72,83), i.e. GlobalGenerator and
# the two multiscale discriminators. mask_net, AppearanceEncoder, and
# AcCropDiscriminator are built directly (model.py:69,85,
# trainer.py:77) and keep torch DEFAULTS (kaiming-uniform convs). We use
# conv_init_gan in MaskNet too — a DOCUMENTED init divergence (see
# generators.py MaskNet) — and flax's default (lecun-normal) in CNN where
# the reference uses the torch default; both are framework defaults, not
# weights_init. GCN MLP linears: kaiming normal (graph.py:27-30) — parity.
conv_init_gan = nn.initializers.normal(stddev=0.02)
kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal")


class MaskedBatchNorm(nn.Module):
    """BatchNorm with optional per-sample weights for padded batches.

    Matches torch ``nn.BatchNorm2d``/``BatchNorm1d`` semantics (momentum 0.1,
    eps 1e-5, affine, running stats; biased variance for normalization,
    unbiased for the running update). ``weights`` gives each *row* of the
    batch axis a weight in {0, 1}; zero-weight rows are excluded from the
    statistics but still normalized (their outputs are masked downstream).

    Under pjit/GSPMD the batch axis may be sharded across devices; the mean
    reductions below are global, so XLA inserts the cross-replica collectives
    automatically (this is the "cross-replica BN" answer for SURVEY.md §5).
    """
    use_running_average: Optional[bool] = None
    momentum: float = 0.1
    eps: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, weights: Optional[jax.Array] = None,
                 use_running_average: Optional[bool] = None) -> jax.Array:
        if self.use_running_average is None and use_running_average is None:
            use_ra = False
        else:
            use_ra = nn.merge_param("use_running_average",
                                    self.use_running_average,
                                    use_running_average)
        feat = x.shape[-1]
        reduce_axes = tuple(range(x.ndim - 1))

        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(feat, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(feat, jnp.float32))
        scale = self.param("scale", nn.initializers.normal(0.02, jnp.float32),
                           (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))
        # Scale init 1 + N(0, 0.02): this is weights_init's BN rule
        # (generators.py:11-13), but NOTE the reference never actually
        # applies weights_init to a module containing BN (define_G/define_D
        # nets are instance-norm); its BN layers keep the torch-1.0
        # default (weight ~ U(0, 1)). Divergence kept deliberately — a
        # near-identity BN scale is the saner start, and all committed
        # training evidence used it.
        scale = scale + 1.0

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            # Stats in >= f32 (f64 stays f64 for the CPU parity goldens;
            # bf16 activations still get f32-accurate statistics).
            xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
            if weights is None:
                mean = jnp.mean(xf, axis=reduce_axes)
                var = jnp.mean(jnp.square(xf), axis=reduce_axes) - jnp.square(mean)
                count = jnp.asarray(
                    xf.size / feat, jnp.float32)
            else:
                w = weights.astype(jnp.float32)
                w = w.reshape(w.shape + (1,) * (x.ndim - w.ndim))
                # Elements contributed per unit weight (spatial extent).
                per_row = xf.size / feat / x.shape[0]
                denom = jnp.maximum(jnp.sum(w) * per_row, 1.0)
                mean = jnp.sum(xf * w, axis=reduce_axes) / denom
                var = jnp.sum(jnp.square(xf) * w, axis=reduce_axes) / denom \
                    - jnp.square(mean)
                count = denom
            var = jnp.maximum(var, 0.0)
            if not self.is_initializing():
                m = self.momentum
                unbias = count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * var * unbias

        y = (x - mean.astype(x.dtype)) * jax.lax.rsqrt(
            var.astype(x.dtype) + jnp.asarray(self.eps, x.dtype))
        return y * scale.astype(x.dtype) + bias.astype(x.dtype)


class MLP(nn.Module):
    """build_mlp equivalent (reference layers.py:215-231).

    ``dims`` = [in, hidden..., out]; ReLU (or leakyrelu) after every layer
    including the last when ``final_nonlinearity``; optional BatchNorm1d.
    """
    dims: Sequence[int]
    activation: str = "relu"
    batch_norm: str = "none"
    final_nonlinearity: bool = True
    kernel_init: Callable = kaiming_normal
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True,
                 weights: Optional[jax.Array] = None) -> jax.Array:
        act = (relu if self.activation == "relu"
               else get_activation(self.activation))
        n = len(self.dims) - 1
        for i in range(n):
            x = nn.Dense(self.dims[i + 1], kernel_init=self.kernel_init,
                         dtype=self.dtype)(x)
            final_layer = i == n - 1
            if not final_layer or self.final_nonlinearity:
                if self.batch_norm == "batch":
                    x = MaskedBatchNorm(dtype=self.dtype)(
                        x, weights=weights, use_running_average=not train)
                x = act(x)
        return x


class ResnetBlock(nn.Module):
    """pix2pixHD resnet block (reference layers.py:234-273): reflect-pad
    3x3 conv -> norm -> ReLU -> reflect-pad 3x3 conv -> norm, + skip."""
    features: int
    norm: str = "instance"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        def normalize(h):
            if self.norm == "instance":
                return instance_norm(h)
            raise ValueError(f"norm '{self.norm}' not supported in ResnetBlock")

        h = reflect_pad_2d(x, 1)
        h = nn.Conv(self.features, (3, 3), padding="VALID",
                    kernel_init=conv_init_gan, dtype=self.dtype)(h)
        h = relu(normalize(h))
        h = reflect_pad_2d(h, 1)
        h = nn.Conv(self.features, (3, 3), padding="VALID",
                    kernel_init=conv_init_gan, dtype=self.dtype)(h)
        h = normalize(h)
        return x + h


class ResidualBlock(nn.Module):
    """'R' block of the build_cnn DSL (reference layers.py:88-116).

    The reference has a latent shortcut bug (crop guarded by ``P == 0``,
    layers.py:112-114) and computes ``net(x)`` twice (layers.py:115-116);
    both are dead under default configs. We implement the intended op:
    norm-act-conv-norm-act-conv with identity shortcut (cropped when the
    convs are 'valid').
    """
    features: int
    normalization: str = "batch"
    activation: str = "relu"
    padding: str = "same"
    kernel_size: int = 3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True,
                 weights: Optional[jax.Array] = None) -> jax.Array:
        act = get_activation(self.activation)
        pad = "SAME" if self.padding == "same" else "VALID"

        def normalize(h):
            if self.normalization == "batch":
                return MaskedBatchNorm(dtype=self.dtype)(
                    h, weights=weights, use_running_average=not train)
            if self.normalization == "instance":
                return instance_norm(h)
            return h

        h = act(normalize(x))
        h = nn.Conv(self.features, (self.kernel_size,) * 2, padding=pad,
                    dtype=self.dtype)(h)
        h = act(normalize(h))
        h = nn.Conv(self.features, (self.kernel_size,) * 2, padding=pad,
                    dtype=self.dtype)(h)
        if pad == "VALID":
            crop = self.kernel_size - 1  # per conv, both sides combined
            x = x[:, crop:-crop, crop:-crop, :]
        return x + h


class CNN(nn.Module):
    """build_cnn string-DSL CNN (reference layers.py:128-212).

    Layer specs (comma-separated): ``IX`` input channels, ``CK-X[-S]`` KxK
    conv with X channels (stride S), ``R`` residual block, ``UX`` nearest
    upsample, ``PX`` pool, ``FC-D-D'`` flatten+dense. Every conv except the
    first is preceded by normalization + activation.
    """
    arch: str
    normalization: str = "batch"
    activation: str = "relu"
    padding: str = "same"
    pooling: str = "max"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True,
                 weights: Optional[jax.Array] = None) -> jax.Array:
        act = get_activation(self.activation)
        pad = "SAME" if self.padding == "same" else "VALID"

        def normalize(h):
            if self.normalization == "batch":
                return MaskedBatchNorm(dtype=self.dtype)(
                    h, weights=weights, use_running_average=not train)
            if self.normalization == "instance":
                return instance_norm(h)
            return h

        specs = self.arch.split(",")
        if specs and specs[0].startswith("I"):
            specs = specs[1:]  # input channels are implicit in NHWC input

        first_conv = True
        for i, s in enumerate(specs):
            if s[0] == "C":
                if not first_conv:
                    x = act(normalize(x))
                first_conv = False
                vals = [int(v) for v in s[1:].split("-")]
                k, feat = vals[0], vals[1]
                stride = vals[2] if len(vals) == 3 else 1
                x = nn.Conv(feat, (k, k), strides=(stride, stride),
                            padding=pad, dtype=self.dtype)(x)
                if 0 in x.shape:
                    raise ValueError(
                        f"CNN spec '{s}' produced empty output {x.shape}; "
                        f"input too small for arch '{self.arch}'")
            elif s[0] == "R":
                norm = "none" if first_conv else self.normalization
                x = ResidualBlock(x.shape[-1], normalization=norm,
                                  activation=self.activation,
                                  padding=self.padding, dtype=self.dtype)(
                                      x, train=train, weights=weights)
                first_conv = False
            elif s[0] == "U":
                f = int(s[1:])
                x = jnp.repeat(jnp.repeat(x, f, axis=1), f, axis=2)
            elif s[0] == "P":
                f = int(s[1:])
                fn = nn.max_pool if self.pooling == "max" else nn.avg_pool
                x = fn(x, (f, f), strides=(f, f))
            elif s.startswith("FC"):
                _, din, dout = s.split("-")
                x = x.reshape(x.shape[0], -1)
                x = nn.Dense(int(dout), dtype=self.dtype)(x)
                if i + 1 < len(specs):
                    x = act(x)
            else:
                raise ValueError(f"Invalid layer spec '{s}'")
        return x


def avg_pool_3x3_s2(x: jax.Array) -> jax.Array:
    """AvgPool2d(3, stride=2, padding=1, count_include_pad=False) — the
    between-scale downsampler of the multiscale discriminators
    (discriminators.py:99,184). flax's avg_pool implements the
    edge-count correction directly."""
    return nn.avg_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)),
                       count_include_pad=False)
