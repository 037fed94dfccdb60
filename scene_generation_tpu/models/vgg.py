"""VGG19 feature extractor for the perceptual loss (flax, NHWC).

Reference: ``Vgg19`` (losses.py:179-209) slices torchvision's pretrained
``vgg19().features`` at relu1_1 / relu2_1 / relu3_1 / relu4_1 / relu5_1.

This module reproduces the architecture up to conv5_1 and exposes the same
five taps. Pretrained weights are loaded from a torchvision checkpoint file
when available (``load_torch_vgg19``); in a zero-egress environment without
cached weights the loss degrades to random-projection features (still a
valid training signal, documented divergence until weights are shipped).
"""
from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# Convs per stage up to and including conv{k}_1 of the next stage.
# torchvision vgg19.features layout: see losses.py:188-197.
_STAGES = (
    ((64, "conv1_1"),),                                            # -> relu1_1
    ((64, "conv1_2"), ("pool",), (128, "conv2_1")),                # -> relu2_1
    ((128, "conv2_2"), ("pool",), (256, "conv3_1")),               # -> relu3_1
    ((256, "conv3_2"), (256, "conv3_3"), (256, "conv3_4"),
     ("pool",), (512, "conv4_1")),                                 # -> relu4_1
    ((512, "conv4_2"), (512, "conv4_3"), (512, "conv4_4"),
     ("pool",), (512, "conv5_1")),                                 # -> relu5_1
)


class Vgg19Features(nn.Module):
    """Returns [relu1_1, relu2_1, relu3_1, relu4_1, relu5_1] activations."""
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        taps = []
        for stage in _STAGES:
            for spec in stage:
                if spec[0] == "pool":
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
                else:
                    feat, name = spec
                    x = nn.Conv(feat, (3, 3), padding="SAME", name=name,
                                dtype=self.dtype)(x)
                    x = jax.nn.relu(x)
            taps.append(x)
        return taps


def _torch_checkpoint_path() -> Optional[str]:
    cands = []
    hub = os.path.expanduser("~/.cache/torch/hub/checkpoints")
    if os.path.isdir(hub):
        cands += [os.path.join(hub, f) for f in os.listdir(hub)
                  if f.startswith("vgg19") and f.endswith(".pth")]
    env = os.environ.get("SGT_VGG19_WEIGHTS")
    if env:
        cands.insert(0, env)
    for c in cands:
        if os.path.isfile(c):
            return c
    return None


def load_torch_vgg19(params: dict, path: Optional[str] = None) -> tuple[dict, bool]:
    """Overwrite flax params with torchvision vgg19 weights if available.

    Returns (params, loaded). Torch conv weights (out, in, kh, kw) transpose
    to flax kernels (kh, kw, in, out).
    """
    path = path or _torch_checkpoint_path()
    if path is None:
        return params, False
    import torch  # local import; CPU torch is available in the image

    sd = torch.load(path, map_location="cpu", weights_only=True)
    # torchvision indices of the conv layers in features, in order.
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28]
    names = [n for stage in _STAGES for (*_, n) in
             [s for s in stage if s[0] != "pool"]]
    new = dict(params)
    for idx, name in zip(conv_idx, names):
        wkey, bkey = f"features.{idx}.weight", f"features.{idx}.bias"
        kernel = np.transpose(sd[wkey].numpy(), (2, 3, 1, 0))
        new[name] = {"kernel": jnp.asarray(kernel),
                     "bias": jnp.asarray(sd[bkey].numpy())}
    return new, True


def create_vgg(rng: jax.Array, image_size, dtype=None):
    """Initialize Vgg19Features; load pretrained weights when present."""
    model = Vgg19Features(dtype=dtype)
    dummy = jnp.zeros((1, image_size[0], image_size[1], 3))
    params = model.init(rng, dummy)["params"]
    params, loaded = load_torch_vgg19(dict(params))
    return model, {"params": params}, loaded
