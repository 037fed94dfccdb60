"""LPIPS perceptual distance (diversity metric #3 of the reference's
protocol, README.md:81 -> richzhang/PerceptualSimilarity).

LPIPS(x, y) = sum_l mean_hw || w_l . (f_l(x)^ - f_l(y)^) ||_2^2, where
f_l are VGG16 activations at relu1_2 / relu2_2 / relu3_3 / relu4_3 /
relu5_3, ^ is unit normalization over channels, and w_l are the learned
per-channel "lin" weights of LPIPS v0.1 ('vgg' net).

Weight files (both torchvision vgg16 and the 7KB LPIPS lin head) are
fetched by scripts/fetch_pretrained.py; without them the metric runs on
random VGG features with uniform lin weights — distances are then only
comparable *relatively* within one run (documented divergence, same policy
as the IS fallback in models/inception.py).

Inputs follow the repo convention: NHWC float32 images in [-1, 1] (LPIPS's
own expected scaling).
"""
from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# torchvision vgg16.features conv indices and the tap points (after the
# ReLU following the named conv): relu1_2=idx1, relu2_2=idx3, relu3_3=idx6,
# relu4_3=idx9, relu5_3=idx12 in conv order.
_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512]
_TAP_CONVS = (1, 3, 6, 9, 12)   # 0-based conv counter values to tap after
_LPIPS_CHANNELS = (64, 128, 256, 512, 512)


class Vgg16Features(nn.Module):
    """VGG16 features with the five LPIPS taps."""
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        taps = []
        conv_i = 0
        for spec in _VGG16_CFG:
            if spec == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            x = nn.Conv(spec, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"conv{conv_i}")(x)
            x = jax.nn.relu(x)
            if conv_i in _TAP_CONVS:
                taps.append(x)
            conv_i += 1
        return taps


def load_torch_vgg16(params: dict, path: Optional[str] = None):
    """Overwrite flax params with torchvision vgg16 weights if available."""
    path = path or _find_weights("SGT_VGG16_WEIGHTS", "vgg16-")
    if path is None or not os.path.isfile(path):
        return params, False
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    new = dict(params)
    for i, idx in enumerate(conv_idx):
        kernel = np.transpose(sd[f"features.{idx}.weight"].numpy(),
                              (2, 3, 1, 0))
        new[f"conv{i}"] = {"kernel": jnp.asarray(kernel),
                           "bias": jnp.asarray(
                               sd[f"features.{idx}.bias"].numpy())}
    return new, True


def load_lpips_lin(path: Optional[str] = None):
    """LPIPS v0.1 'vgg' linear head: per-channel nonnegative weights
    lin{0..4}.model.1.weight of shape (1, C, 1, 1). Returns (list of (C,)
    arrays, loaded_flag); uniform 1/C weights when the file is absent."""
    path = path or _find_weights("SGT_LPIPS_WEIGHTS", "lpips_vgg")
    if path is None or not os.path.isfile(path):
        return [np.full((c,), 1.0 / c, np.float32)
                for c in _LPIPS_CHANNELS], False
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return [np.asarray(sd[f"lin{i}.model.1.weight"]).reshape(-1)
            for i in range(5)], True


def _find_weights(env: str, prefix: str) -> Optional[str]:
    p = os.environ.get(env)
    if p and os.path.isfile(p):
        return p
    hub = os.path.expanduser("~/.cache/torch/hub/checkpoints")
    if os.path.isdir(hub):
        for f in sorted(os.listdir(hub)):
            if f.startswith(prefix) and f.endswith(".pth"):
                return os.path.join(hub, f)
    return None


# LPIPS input scaling (lpips/lpips.py ScalingLayer): images in [-1, 1]
# are shifted/scaled per channel before VGG.
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def create_lpips_fn(rng: Optional[jax.Array] = None):
    """-> (lpips_fn(x, y) -> (N,) distances, loaded_flag). x, y: NHWC in
    [-1, 1]."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    model = Vgg16Features()
    params = dict(model.init(rng, jnp.zeros((1, 64, 64, 3)))["params"])
    params, vgg_loaded = load_torch_vgg16(params)
    lins, lin_loaded = load_lpips_lin()
    lins = [jnp.asarray(w) for w in lins]
    variables = {"params": params}

    # Weights are ARGUMENTS of the jitted function, not closure captures:
    # captured constants get baked into the HLO and the ~60 MB of VGG16
    # tensors then constant-fold during remote-TPU compilation (multi-minute
    # stalls; CLAUDE.md "NEVER closure-capture big arrays").
    @jax.jit
    def _lpips(variables, lins, x: jax.Array, y: jax.Array) -> jax.Array:
        x = (x - _SHIFT) / _SCALE
        y = (y - _SHIFT) / _SCALE
        fx = model.apply(variables, x)
        fy = model.apply(variables, y)
        total = 0.0
        for a, b, w in zip(fx, fy, lins):
            a = a * jax.lax.rsqrt(jnp.sum(a * a, -1, keepdims=True) + 1e-10)
            b = b * jax.lax.rsqrt(jnp.sum(b * b, -1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
        return total

    def lpips_fn(x: jax.Array, y: jax.Array) -> jax.Array:
        return _lpips(variables, lins, x, y)

    return lpips_fn, (vgg_loaded and lin_loaded)
