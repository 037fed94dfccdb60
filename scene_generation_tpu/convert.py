"""Reference-checkpoint porting: torch ``Model`` state_dict -> SceneModel.

Maps the COMPLETE generator-side state_dict of the reference
``scene_generation.model.Model`` (reference model.py:12-92; checkpoint key
``model_state``, reference train.py:152) onto this framework's
``SceneModel`` variable tree ({"params", "batch_stats"}), so released /
reference-trained weights run natively here. Full-forward parity (boxes,
masks, layouts, image; train AND test mode; f64) is pinned by
``tests/test_model_port_golden.py`` against the actual reference model.

Layout conversions (torch -> flax/NHWC):
  Linear      (out, in)            -> kernel (in, out)
  Conv2d      (out, in, kh, kw)    -> kernel (kh, kw, in, out)   [HWIO]
  ConvTranspose2d (in, out, kh, kw)-> kernel (kh, kw, out, in)
      (``transpose_kernel=True`` layout; requires cfg.torch_deconv so the
      upsample math bit-matches — see models/generators.py GlobalGenerator)
  Embedding   (num, dim)           -> embedding (num, dim)
  BatchNorm   weight/bias + running_mean/var
      -> params {scale = weight - 1, bias}, batch_stats {mean, var}
      (MaskedBatchNorm stores ``scale`` as an offset from 1 —
      models/layers.py:108-118)

The converter is STRICT: every state_dict entry must be consumed (except
``num_batches_tracked`` counters) and every expected key must exist —
a mapping bug fails loudly instead of silently keeping random init.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Mapping, Tuple

import numpy as np

from scene_generation_tpu.config import ModelConfig


class _StateDict:
    """Strict key-accounting view over a torch state_dict (numpy values)."""

    def __init__(self, sd: Mapping[str, Any]):
        self._sd = {k: np.asarray(v) for k, v in sd.items()}
        self._used = set()

    def take(self, key: str) -> np.ndarray:
        if key not in self._sd:
            raise KeyError(f"reference state_dict is missing '{key}'")
        self._used.add(key)
        return self._sd[key]

    def finish(self) -> None:
        left = [k for k in self._sd
                if k not in self._used
                and not k.endswith("num_batches_tracked")]
        if left:
            raise ValueError(
                "unconverted reference keys (mapping incomplete): "
                + ", ".join(sorted(left)[:20])
                + (" ..." if len(left) > 20 else ""))


def _linear(sd: _StateDict, p: str) -> Dict[str, np.ndarray]:
    return {"kernel": sd.take(f"{p}.weight").T,
            "bias": sd.take(f"{p}.bias")}


def _conv(sd: _StateDict, p: str) -> Dict[str, np.ndarray]:
    return {"kernel": sd.take(f"{p}.weight").transpose(2, 3, 1, 0),
            "bias": sd.take(f"{p}.bias")}


def _deconv(sd: _StateDict, p: str) -> Dict[str, np.ndarray]:
    # torch (in, out, kh, kw) -> (kh, kw, out, in): the transpose_kernel
    # layout pinned by tests/test_torch_deconv.py.
    return {"kernel": sd.take(f"{p}.weight").transpose(2, 3, 1, 0),
            "bias": sd.take(f"{p}.bias")}


def _bn(sd: _StateDict, p: str) -> Tuple[Dict, Dict]:
    params = {"scale": sd.take(f"{p}.weight") - 1.0,
              "bias": sd.take(f"{p}.bias")}
    stats = {"mean": sd.take(f"{p}.running_mean").astype(np.float32),
             "var": sd.take(f"{p}.running_var").astype(np.float32)}
    return params, stats


def _mlp(sd: _StateDict, prefix: str, n_dense: int,
         batch_norm: str) -> Tuple[Dict, Dict]:
    """build_mlp Sequential (reference layers.py:215-231) -> MLP params.

    All of Model's MLPs use final_nonlinearity=True, so each Dense is
    followed by [BN?, Act] and the Sequential stride is uniform.
    """
    stride = 3 if batch_norm == "batch" else 2
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for j in range(n_dense):
        params[f"Dense_{j}"] = _linear(sd, f"{prefix}.{j * stride}")
        if batch_norm == "batch":
            p, s = _bn(sd, f"{prefix}.{j * stride + 1}")
            params[f"MaskedBatchNorm_{j}"] = p
            stats[f"MaskedBatchNorm_{j}"] = s
    return params, stats


def _gconv(sd: _StateDict, prefix: str,
           mlp_normalization: str) -> Tuple[Dict, Dict]:
    """GraphTripleConv (reference graph.py:33-56): net1 + net2 MLPs."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for net in ("net1", "net2"):
        p, s = _mlp(sd, f"{prefix}.{net}", 2, mlp_normalization)
        params[net] = p
        if s:
            stats[net] = s
    return params, stats


def _stack(trees):
    """Stack a list of identical trees along a new leading axis (nn.scan)."""
    first = trees[0]
    if isinstance(first, dict):
        return {k: _stack([t[k] for t in trees]) for k in first}
    return np.stack(trees, axis=0)


def _cnn(sd: _StateDict, prefix: str, arch: str,
         normalization: str) -> Tuple[Dict, Dict]:
    """build_cnn conv-only arch (reference layers.py:128-212) -> CNN params.

    Replays the reference's Sequential index assignment: the first conv has
    no preceding norm/act; every later conv is preceded by [norm?, act].
    'none' norms are filtered out of the Sequential (layers.py:209), so
    they occupy no index; 'instance' occupies an index but has no params.
    """
    specs = [s for s in arch.split(",") if not s.startswith("I")]
    if any(s[0] != "C" for s in specs):
        raise NotImplementedError(
            f"only conv-only archs are portable (got '{arch}')")
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    idx = 0
    for j, _ in enumerate(specs):
        if j > 0:
            if normalization == "batch":
                p, s = _bn(sd, f"{prefix}.{idx}")
                params[f"MaskedBatchNorm_{j - 1}"] = p
                stats[f"MaskedBatchNorm_{j - 1}"] = s
                idx += 1
            elif normalization == "instance":
                idx += 1  # InstanceNorm2d: occupies an index, no params
            idx += 1      # activation
        params[f"Conv_{j}"] = _conv(sd, f"{prefix}.{idx}")
        idx += 1
    return params, stats


def convert_reference_state_dict(state_dict: Mapping[str, Any],
                                 cfg: ModelConfig) -> Dict[str, Any]:
    """Convert a reference ``Model.state_dict()`` into SceneModel variables.

    Args:
      state_dict: torch state_dict (tensors or numpy arrays) of the
        reference ``scene_generation.model.Model`` built with the
        architecture described by ``cfg``.
      cfg: the matching ModelConfig. Must have ``torch_deconv=True`` (the
        upsample convs only bit-match in that mode) and
        ``layout_embed_dim=0`` (the reference uses one-hot class channels;
        a learned class embedding has no reference counterpart).

    Returns:
      {"params": ..., "batch_stats": ...} ready for ``SceneModel.apply``.
    """
    if not cfg.torch_deconv:
        raise ValueError(
            "reference weight ports require torch_deconv=True: the default "
            "flax 'SAME' transpose conv is a one-pixel-shifted, unflipped "
            "variant that does NOT match ConvTranspose2d (see "
            "models/generators.py GlobalGenerator.torch_deconv)")
    if cfg.layout_embed_dim:
        raise ValueError(
            "reference weight ports require layout_embed_dim=0 (one-hot "
            "layout class channels; the learned embedding has no reference "
            "counterpart)")
    sd = _StateDict({k: (v.detach().cpu().numpy()
                         if hasattr(v, "detach") else v)
                     for k, v in state_dict.items()})
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["obj_embeddings"] = {"embedding": sd.take("obj_embeddings.weight")}
    params["pred_embeddings"] = {
        "embedding": sd.take("pred_embeddings.weight")}

    mlp_bn = cfg.mlp_normalization
    if cfg.gconv_num_layers == 0:
        params["gconv_linear"] = _linear(sd, "gconv")
    else:
        p, s = _gconv(sd, "gconv", mlp_bn)
        params["gconv"] = p
        if s:
            stats["gconv"] = s
    if cfg.gconv_num_layers > 1:
        layers = [_gconv(sd, f"gconv_net.gconvs.{i}", mlp_bn)
                  for i in range(cfg.gconv_num_layers - 1)]
        params["gconv_net"] = {
            "layers": {"gconv": _stack([p for p, _ in layers])}}
        if layers[0][1]:
            stats["gconv_net"] = {
                "layers": {"gconv": _stack([s for _, s in layers])}}

    p, s = _mlp(sd, "box_net", 2, mlp_bn)
    params["box_net"] = p
    if s:
        stats["box_net"] = s
    p, s = _mlp(sd, "repr_net", 2, mlp_bn)
    params["repr_net"] = p
    if s:
        stats["repr_net"] = s

    # mask_net (reference generators.py:16-28): L x [Interpolate, Conv, BN,
    # ReLU] + final 1x1 Conv. BatchNorm2d is hard-coded (independent of
    # mlp_normalization).
    n_up = int(math.log2(cfg.mask_size))
    mp: Dict[str, Any] = {}
    ms: Dict[str, Any] = {}
    for j in range(n_up):
        mp[f"Conv_{j}"] = _conv(sd, f"mask_net.{4 * j + 1}")
        bp, bs = _bn(sd, f"mask_net.{4 * j + 2}")
        mp[f"MaskedBatchNorm_{j}"] = bp
        ms[f"MaskedBatchNorm_{j}"] = bs
    mp[f"Conv_{n_up}"] = _conv(sd, f"mask_net.{4 * n_up}")
    params["mask_net"] = mp
    stats["mask_net"] = ms

    # AppearanceEncoder (reference generators.py:31-48):
    # Sequential(build_cnn, GlobalAvgPool, Linear) under 'image_encoder.cnn'.
    cp, cs = _cnn(sd, "image_encoder.cnn.0", cfg.appearance_arch,
                  cfg.appearance_normalization)
    params["image_encoder"] = {"CNN_0": cp,
                               "Dense_0": _linear(sd, "image_encoder.cnn.2")}
    if cs:
        stats["image_encoder"] = {"CNN_0": cs}

    # GlobalGenerator (reference generators.py:62-91), norm='instance'
    # (affine=False: occupies a Sequential index, contributes no params).
    nd, nb = cfg.n_downsample_global, cfg.n_blocks_global
    g: Dict[str, Any] = {}
    g["Conv_0"] = _conv(sd, "layout_to_image.model.1")       # 7x7 stem
    for i in range(nd):
        g[f"Conv_{i + 1}"] = _conv(sd, f"layout_to_image.model.{4 + 3 * i}")
    blocks = []
    for i in range(nb):
        base = f"layout_to_image.model.{4 + 3 * nd + i}.conv_block"
        blocks.append({"Conv_0": _conv(sd, f"{base}.1"),
                       "Conv_1": _conv(sd, f"{base}.5")})
    if cfg.scan_blocks:
        g["resblocks"] = {"block": _stack(blocks)}
    else:
        for i, b in enumerate(blocks):
            g[f"resblock_{i}"] = b
    up_base = 4 + 3 * nd + nb
    for i in range(nd):
        g[f"ConvTranspose_{i}"] = _deconv(
            sd, f"layout_to_image.model.{up_base + 3 * i}")
    g[f"Conv_{nd + 1}"] = _conv(
        sd, f"layout_to_image.model.{up_base + 3 * nd + 1}")
    params["layout_to_image"] = g

    sd.finish()
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# Discriminators (reference checkpoint keys d_obj_state / d_img_state /
# d_mask_state, reference train.py:154-160) — porting them too makes a
# reference checkpoint fully resumable, not just servable.
# ---------------------------------------------------------------------------

def convert_reference_d_obj(state_dict: Mapping[str, Any],
                            arch: str = "C4-64-2,C4-128-2,C4-256-2",
                            normalization: str = "none") -> Dict[str, Any]:
    """AcCropDiscriminator state_dict -> flax variables.

    Reference structure (discriminators.py:10-51):
    ``discriminator.cnn`` = Sequential(build_cnn, GlobalAvgPool,
    Linear(D, 1024)) + ``real_classifier``/``obj_classifier`` heads.
    Flax call order (models/discriminators.py AcDiscriminator): CNN_0,
    Dense_0 (1024), Dense_1 (real), Dense_2 (obj logits).
    """
    sd = _StateDict({k: (v.detach().cpu().numpy()
                         if hasattr(v, "detach") else v)
                     for k, v in state_dict.items()})
    cp, cs = _cnn(sd, "discriminator.cnn.0", arch, normalization)
    params = {"discriminator": {
        "CNN_0": cp,
        "Dense_0": _linear(sd, "discriminator.cnn.2"),
        "Dense_1": _linear(sd, "discriminator.real_classifier"),
        "Dense_2": _linear(sd, "discriminator.obj_classifier"),
    }}
    out = {"params": params, "batch_stats": {}}
    if cs:
        out["batch_stats"] = {"discriminator": {"CNN_0": cs}}
    sd.finish()
    return out


def convert_reference_multiscale_d(state_dict: Mapping[str, Any],
                                   num_d: int,
                                   n_layers: int) -> Dict[str, Any]:
    """Multiscale(Mask)Discriminator state_dict -> flax params.

    Reference structure (discriminators.py:87-124,172-202): per scale i,
    per stage j, ``scale{i}_layer{j}`` is a Sequential whose conv sits at
    index 0 (instance norm affine=False holds no params). Flax:
    ``scale_{i}/Conv_{j}``. Covers both the image PatchGAN (kw=4) and the
    class-conditional mask PatchGAN (kw=3) — the kernel size lives in the
    weights.
    """
    sd = _StateDict({k: (v.detach().cpu().numpy()
                         if hasattr(v, "detach") else v)
                     for k, v in state_dict.items()})
    params: Dict[str, Any] = {}
    for i in range(num_d):
        scale = {}
        for j in range(n_layers + 2):
            scale[f"Conv_{j}"] = _conv(sd, f"scale{i}_layer{j}.0")
        params[f"scale_{i}"] = scale
    sd.finish()
    return {"params": params}
