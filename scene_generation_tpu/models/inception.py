"""InceptionV3 (torchvision layout) in flax, for the Inception Score.

Reference: ``scripts/inception_score.py`` feeds [-1, 1] images bilinearly
resized to 299x299 into torchvision ``inception_v3(transform_input=False)``
and accumulates softmax predictions. This module reproduces that
architecture exactly (BasicConv2d = bias-free conv + BN(eps=1e-3) + ReLU)
so public torchvision weights convert 1:1; without a weight file the score
is computed over a random-init network (documented divergence — relative
comparisons only).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class BasicConv2d(nn.Module):
    features: int
    kernel: tuple
    strides: tuple = (1, 1)
    padding: tuple = ((0, 0), (0, 0))
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         momentum=0.9, dtype=self.dtype, name="bn")(x)
        return jax.nn.relu(x)


def _pad(p):
    return ((p, p), (p, p))


class InceptionA(nn.Module):
    pool_features: int
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1", dtype=self.dtype)(x, train)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1", dtype=self.dtype)(x, train)
        b5 = BasicConv2d(64, (5, 5), padding=_pad(2), name="branch5x5_2",
                         dtype=self.dtype)(b5, train)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1", dtype=self.dtype)(x, train)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(1), name="branch3x3dbl_2",
                         dtype=self.dtype)(b3, train)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(1), name="branch3x3dbl_3",
                         dtype=self.dtype)(b3, train)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=_pad(1))
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool",
                         dtype=self.dtype)(bp, train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3",
                         dtype=self.dtype)(x, train)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1", dtype=self.dtype)(x, train)
        bd = BasicConv2d(96, (3, 3), padding=_pad(1), name="branch3x3dbl_2",
                         dtype=self.dtype)(bd, train)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3",
                         dtype=self.dtype)(bd, train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1", dtype=self.dtype)(x, train)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1", dtype=self.dtype)(x, train)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7_2", dtype=self.dtype)(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7_3", dtype=self.dtype)(b7, train)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1", dtype=self.dtype)(x, train)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7dbl_2", dtype=self.dtype)(bd, train)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7dbl_3", dtype=self.dtype)(bd, train)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7dbl_4", dtype=self.dtype)(bd, train)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7dbl_5", dtype=self.dtype)(bd, train)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=_pad(1))
        bp = BasicConv2d(192, (1, 1), name="branch_pool", dtype=self.dtype)(bp, train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1", dtype=self.dtype)(x, train)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2",
                         dtype=self.dtype)(b3, train)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1", dtype=self.dtype)(x, train)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7x3_2", dtype=self.dtype)(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7x3_3", dtype=self.dtype)(b7, train)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4",
                         dtype=self.dtype)(b7, train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1", dtype=self.dtype)(x, train)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1", dtype=self.dtype)(x, train)
        b3a = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)),
                          name="branch3x3_2a", dtype=self.dtype)(b3, train)
        b3b = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)),
                          name="branch3x3_2b", dtype=self.dtype)(b3, train)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1", dtype=self.dtype)(x, train)
        bd = BasicConv2d(384, (3, 3), padding=_pad(1), name="branch3x3dbl_2",
                         dtype=self.dtype)(bd, train)
        bda = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)),
                          name="branch3x3dbl_3a", dtype=self.dtype)(bd, train)
        bdb = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)),
                          name="branch3x3dbl_3b", dtype=self.dtype)(bd, train)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=_pad(1))
        bp = BasicConv2d(192, (1, 1), name="branch_pool", dtype=self.dtype)(bp, train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """torchvision inception_v3 (aux logits ignored), NHWC, 299x299 input."""
    num_classes: int = 1000
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, train: bool = False,
                 return_features: bool = False):
        d = self.dtype
        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3",
                        dtype=d)(x, train)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3", dtype=d)(x, train)
        x = BasicConv2d(64, (3, 3), padding=_pad(1), name="Conv2d_2b_3x3",
                        dtype=d)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1", dtype=d)(x, train)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3", dtype=d)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, name="Mixed_5b", dtype=d)(x, train)
        x = InceptionA(64, name="Mixed_5c", dtype=d)(x, train)
        x = InceptionA(64, name="Mixed_5d", dtype=d)(x, train)
        x = InceptionB(name="Mixed_6a", dtype=d)(x, train)
        x = InceptionC(128, name="Mixed_6b", dtype=d)(x, train)
        x = InceptionC(160, name="Mixed_6c", dtype=d)(x, train)
        x = InceptionC(160, name="Mixed_6d", dtype=d)(x, train)
        x = InceptionC(192, name="Mixed_6e", dtype=d)(x, train)
        x = InceptionD(name="Mixed_7a", dtype=d)(x, train)
        x = InceptionE(name="Mixed_7b", dtype=d)(x, train)
        x = InceptionE(name="Mixed_7c", dtype=d)(x, train)
        pooled = jnp.mean(x, axis=(1, 2))   # (N, 2048) "pool3" features
        logits = nn.Dense(self.num_classes, dtype=d, name="fc")(pooled)
        if return_features:
            return logits, pooled
        return logits


def resize_bilinear(imgs: jax.Array, size=(299, 299)) -> jax.Array:
    """F.interpolate(mode='bilinear') equivalent (inception_score.py:30)."""
    n, _, _, c = imgs.shape
    return jax.image.resize(imgs, (n, size[0], size[1], c), method="bilinear")


def _torch_checkpoint_path() -> Optional[str]:
    env = os.environ.get("SGT_INCEPTION_WEIGHTS")
    cands = [env] if env else []
    hub = os.path.expanduser("~/.cache/torch/hub/checkpoints")
    if os.path.isdir(hub):
        cands += [os.path.join(hub, f) for f in os.listdir(hub)
                  if f.startswith("inception") and f.endswith(".pth")]
    for c in cands:
        if c and os.path.isfile(c):
            return c
    return None


def load_torch_inception(variables: dict, path: Optional[str] = None):
    """Convert torchvision inception_v3 weights into the flax pytree."""
    path = path or _torch_checkpoint_path()
    if path is None:
        return variables, False
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    params = jax.tree.map(np.asarray, dict(variables["params"]))
    stats = jax.tree.map(np.asarray, dict(variables["batch_stats"]))

    def visit(tree, prefix, fn):
        for k, v in tree.items():
            p = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                visit(v, p, fn)
            else:
                fn(tree, k, p)

    def convert(tree, key, path_):
        torch_key = path_.replace("/", ".")
        parts = torch_key.split(".")
        # flax: <Mixed>.<branch>.conv.kernel -> torch <Mixed>.<branch>.conv.weight
        if key == "kernel" and parts[-2] == "conv":
            w = sd[".".join(parts[:-1]) + ".weight"].numpy()
            tree[key] = np.transpose(w, (2, 3, 1, 0))
        elif key == "kernel":  # fc
            tree[key] = sd["fc.weight"].numpy().T
        elif key == "bias" and parts[-2] == "fc":
            tree[key] = sd["fc.bias"].numpy()
        elif parts[-2] == "bn":
            base = ".".join(parts[:-1])
            mapping = {"scale": "weight", "bias": "bias"}
            tree[key] = sd[base + "." + mapping[key]].numpy()

    def convert_stats(tree, key, path_):
        parts = path_.split(".")
        base = ".".join(parts[:-1])
        mapping = {"mean": "running_mean", "var": "running_var"}
        tree[key] = sd[base + "." + mapping[key]].numpy()

    visit(params, "", lambda t, k, p: convert(t, k, p))
    visit(stats, "", lambda t, k, p: convert_stats(t, k, p))
    return {"params": params, "batch_stats": stats}, True


def create_inception_probs_fn(rng: Optional[jax.Array] = None,
                              dtype=None):
    """-> (probs_fn(imgs [-1,1] NHWC) -> (N, 1000) softmax, loaded_flag)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    model = InceptionV3(dtype=dtype)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        rng, jnp.zeros((1, 299, 299, 3)))
    variables, loaded = load_torch_inception(dict(variables))

    @jax.jit
    def probs_fn(imgs):
        x = resize_bilinear(imgs.astype(jnp.float32))
        logits = model.apply(variables, x, train=False)
        return jax.nn.softmax(logits, axis=-1)

    return probs_fn, loaded


def create_inception_features_fn(rng: Optional[jax.Array] = None,
                                 dtype=None):
    """-> (features_fn(imgs [-1,1] NHWC) -> (N, 2048) pool3, loaded_flag).

    Feature extractor for FID (metrics_fid.py)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    model = InceptionV3(dtype=dtype)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        rng, jnp.zeros((1, 299, 299, 3)))
    variables, loaded = load_torch_inception(dict(variables))

    @jax.jit
    def features_fn(imgs):
        x = resize_bilinear(imgs.astype(jnp.float32))
        _, feats = model.apply(variables, x, train=False,
                               return_features=True)
        return feats

    return features_fn, loaded
