"""ResNet (torchvision layout) in flax — backbone for the object
classification accuracy metric.

Reference: ``scripts/train_accuracy_net.py:62-101`` fine-tunes torchvision
``resnet101`` (fc swapped to 172 classes) on GT object crops; the resulting
net scores generated crops in ``sample_images.py:224-239``. Architecture
matches torchvision exactly so public weights convert 1:1.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(h, name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=name)(h)

        identity = x
        h = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = jax.nn.relu(bn(h, "bn1"))
        h = nn.Conv(self.features, (3, 3), strides=(self.strides,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = jax.nn.relu(bn(h, "bn2"))
        h = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(h)
        h = bn(h, "bn3")
        if self.downsample:
            identity = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.strides,) * 2, use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            identity = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype,
                                    name="downsample_bn")(identity)
        return jax.nn.relu(h + identity)


class ResNet(nn.Module):
    stage_sizes: Sequence[int] = (3, 4, 23, 3)  # resnet101
    num_classes: int = 1000
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(h)
        h = jax.nn.relu(h)
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        features = 64
        for stage, blocks in enumerate(self.stage_sizes):
            strides = 1 if stage == 0 else 2
            for b in range(blocks):
                h = Bottleneck(features, strides=strides if b == 0 else 1,
                               downsample=b == 0, dtype=self.dtype,
                               name=f"layer{stage + 1}_{b}")(h, train)
        h = jnp.mean(h, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(h)


def resnet101(num_classes: int = 1000, dtype=None) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 23, 3), num_classes=num_classes,
                  dtype=dtype)


def load_torch_resnet(variables: dict, path: Optional[str] = None,
                      skip_fc: bool = False):
    """Convert a torchvision resnet state dict (weights file) to flax."""
    if path is None:
        env = os.environ.get("SGT_RESNET_WEIGHTS")
        hub = os.path.expanduser("~/.cache/torch/hub/checkpoints")
        cands = [env] if env else []
        if os.path.isdir(hub):
            cands += [os.path.join(hub, f) for f in os.listdir(hub)
                      if f.startswith("resnet101") and f.endswith(".pth")]
        path = next((c for c in cands if c and os.path.isfile(c)), None)
    if path is None:
        return variables, False
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    params = jax.tree.map(np.asarray, dict(variables["params"]))
    stats = jax.tree.map(np.asarray, dict(variables["batch_stats"]))

    def t2f_conv(w):
        return np.transpose(w.numpy(), (2, 3, 1, 0))

    def torch_name(flax_path: str) -> str:
        # layer1_0/conv1 -> layer1.0.conv1 ; downsample_conv -> downsample.0
        parts = flax_path.split("/")
        out = []
        for p in parts:
            if p.startswith("layer") and "_" in p:
                stage, block = p.split("_")
                out += [stage, block]
            elif p == "downsample_conv":
                out += ["downsample", "0"]
            elif p == "downsample_bn":
                out += ["downsample", "1"]
            else:
                out.append(p)
        return ".".join(out)

    def walk(tree, prefix=""):
        for k, v in tree.items():
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, p)
            else:
                tname = torch_name(prefix)
                if k == "kernel" and "fc" in prefix:
                    if not skip_fc and "fc.weight" in sd:
                        tree[k] = sd["fc.weight"].numpy().T
                elif k == "bias" and "fc" in prefix:
                    if not skip_fc and "fc.bias" in sd:
                        tree[k] = sd["fc.bias"].numpy()
                elif k == "kernel":
                    tree[k] = t2f_conv(sd[tname + ".weight"])
                elif k == "scale":
                    tree[k] = sd[tname + ".weight"].numpy()
                elif k == "bias":
                    tree[k] = sd[tname + ".bias"].numpy()
                elif k == "mean":
                    tree[k] = sd[tname + ".running_mean"].numpy()
                elif k == "var":
                    tree[k] = sd[tname + ".running_var"].numpy()

    walk(params)
    walk(stats)
    return {"params": params, "batch_stats": stats}, True
