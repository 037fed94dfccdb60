"""Fetch + verify the pretrained auxiliary weights (VGG19, InceptionV3,
ResNet101) that the reference relies on (losses.py:182 perceptual loss,
scripts/inception_score.py:28 IS, scripts/train_accuracy_net.py:70-82
accuracy net).

This build environment has ZERO network egress, so this script is the
documented install path rather than an import-time download:

  # on any machine with internet access:
  python scripts/fetch_pretrained.py fetch --dest weights/
  # copy weights/ to ~/.cache/torch/hub/checkpoints/ on the training host
  # (or export SGT_VGG19_WEIGHTS / SGT_INCEPTION_WEIGHTS /
  #  SGT_RESNET_WEIGHTS to the individual files), then:
  python scripts/fetch_pretrained.py verify

Integrity: torchvision filenames embed the first 8 hex chars of the file's
SHA256 (torch.hub's own convention); ``fetch`` verifies that prefix after
download and refuses mismatches.

``verify`` runs numerical-tolerance parity checks of the flax ports against
a torch-functional re-enactment driven directly by the downloaded state
dicts (torchvision itself is not installed here):
  * VGG19: all five perceptual-loss taps (relu1_1..relu5_1), atol 1e-3.
  * ResNet101: full network logits, atol 1e-2.
  * InceptionV3: stem conv (Conv2d_1a_3x3) parity + converter coverage
    (every flax param overwritten) — the full branch-concat re-enactment is
    not reproduced here; tests/test_aux_models.py covers layout mapping.
The same checks run as pytest (tests/test_pretrained_real.py), skipped when
the weight files are absent.
"""
from __future__ import annotations

import argparse
import hashlib
import os
import sys

WEIGHTS = {
    # name: (URL, sha256 prefix from the filename; None = no embedded hash
    # — the computed sha256 is printed for manual recording)
    "vgg19": ("https://download.pytorch.org/models/vgg19-dcbb9e9d.pth",
              "dcbb9e9d"),
    "inception_v3": ("https://download.pytorch.org/models/"
                     "inception_v3_google-1a9a5a14.pth", "1a9a5a14"),
    "resnet101": ("https://download.pytorch.org/models/"
                  "resnet101-5d3b4d8f.pth", "5d3b4d8f"),
    # LPIPS diversity metric (reference README.md:81).
    "vgg16": ("https://download.pytorch.org/models/vgg16-397923af.pth",
              "397923af"),
    "lpips_vgg_lin": ("https://github.com/richzhang/PerceptualSimilarity/"
                      "raw/master/lpips/weights/v0.1/vgg.pth", None),
}

DEFAULT_DEST = os.path.expanduser("~/.cache/torch/hub/checkpoints")


def sha256_prefix(path: str, n: int = 8) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()[:n]


def fetch(dest: str) -> int:
    import urllib.request
    os.makedirs(dest, exist_ok=True)
    rc = 0
    for name, (url, prefix) in WEIGHTS.items():
        base = url.rsplit("/", 1)[1]
        if name == "lpips_vgg_lin":
            base = "lpips_vgg_lin-v0.1.pth"  # avoid clash with vgg*.pth
        fname = os.path.join(dest, base)
        if os.path.isfile(fname) and (prefix is None
                                      or sha256_prefix(fname) == prefix):
            print(f"{name}: already present + hash OK ({fname})")
            continue
        print(f"{name}: downloading {url}")
        try:
            tmp = fname + ".part"
            urllib.request.urlretrieve(url, tmp)
            got = sha256_prefix(tmp, 64)
            if prefix is not None and got[:len(prefix)] != prefix:
                os.unlink(tmp)
                print(f"{name}: SHA256 prefix mismatch: got "
                      f"{got[:len(prefix)]}, want {prefix} — refusing")
                rc = 1
                continue
            if prefix is None:
                print(f"{name}: sha256={got} (no pinned hash; record it)")
            os.replace(tmp, fname)
            print(f"{name}: OK -> {fname}")
        except Exception as e:
            print(f"{name}: FAILED: {e}")
            rc = 1
    if rc:
        print("\nSome downloads failed. If this host has no egress (the "
              "build environment doesn't), run\n"
              f"  python scripts/fetch_pretrained.py fetch --dest weights/\n"
              "on a machine with internet access, copy weights/ into "
              f"{DEFAULT_DEST}\n(or export SGT_VGG19_WEIGHTS / "
              "SGT_INCEPTION_WEIGHTS / SGT_RESNET_WEIGHTS /\n"
              "SGT_VGG16_WEIGHTS to the individual files), then run "
              "`fetch_pretrained.py verify`.")
    return rc


# ---------------------------------------------------------------------------
# Torch-functional re-enactments driven by the raw state dicts (no
# torchvision import): the oracles for the flax ports.
# ---------------------------------------------------------------------------


def torch_vgg19_taps(sd, x_nchw):
    """torchvision vgg19.features forward, tapping after relu{k}_1
    (losses.py:188-197 slice points: indices 2, 7, 12, 21, 30)."""
    import torch
    import torch.nn.functional as F
    pool_at = {4, 9, 18, 27, 36}
    tap_after_relu_of_conv = {0, 5, 10, 19, 28}
    taps = []
    x = x_nchw
    with torch.no_grad():
        for i in range(37):
            wk = f"features.{i}.weight"
            if wk in sd:
                x = F.relu(F.conv2d(x, sd[wk], sd[f"features.{i}.bias"],
                                    padding=1))
                if i in tap_after_relu_of_conv:
                    taps.append(x)
            elif i in pool_at:
                x = F.max_pool2d(x, 2, 2)
    return taps


def torch_vgg16_taps(sd, x_nchw):
    """torchvision vgg16.features forward, tapping at the LPIPS slice
    points (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3)."""
    import torch
    import torch.nn.functional as F
    pool_at = {4, 9, 16, 23, 30}
    tap_after_relu_of_conv = {2, 7, 14, 21, 28}
    taps = []
    x = x_nchw
    with torch.no_grad():
        for i in range(31):
            wk = f"features.{i}.weight"
            if wk in sd:
                x = F.relu(F.conv2d(x, sd[wk], sd[f"features.{i}.bias"],
                                    padding=1))
                if i in tap_after_relu_of_conv:
                    taps.append(x)
            elif i in pool_at:
                x = F.max_pool2d(x, 2, 2)
    return taps


def torch_resnet101_logits(sd, x_nchw):
    """torchvision resnet101 forward from the raw state dict."""
    import torch
    import torch.nn.functional as F

    def bn(x, base):
        return F.batch_norm(x, sd[f"{base}.running_mean"],
                            sd[f"{base}.running_var"], sd[f"{base}.weight"],
                            sd[f"{base}.bias"], training=False)

    def block(x, base, stride):
        out = F.relu(bn(F.conv2d(x, sd[f"{base}.conv1.weight"]),
                        f"{base}.bn1"))
        out = F.relu(bn(F.conv2d(out, sd[f"{base}.conv2.weight"],
                                 stride=stride, padding=1), f"{base}.bn2"))
        out = bn(F.conv2d(out, sd[f"{base}.conv3.weight"]), f"{base}.bn3")
        if f"{base}.downsample.0.weight" in sd:
            x = bn(F.conv2d(x, sd[f"{base}.downsample.0.weight"],
                            stride=stride), f"{base}.downsample.1")
        return F.relu(out + x)

    with torch.no_grad():
        x = F.relu(bn(F.conv2d(x_nchw, sd["conv1.weight"], stride=2,
                               padding=3), "bn1"))
        x = F.max_pool2d(x, 3, 2, padding=1)
        for li, (nblocks, stride) in enumerate(
                [(3, 1), (4, 2), (23, 2), (3, 2)], start=1):
            for b in range(nblocks):
                x = block(x, f"layer{li}.{b}", stride if b == 0 else 1)
        x = x.mean(dim=(2, 3))
        return x @ sd["fc.weight"].t() + sd["fc.bias"]


def torch_inception_stem(sd, x_nchw):
    """Conv2d_1a_3x3 (conv s2 + BN(eps=1e-3) + relu)."""
    import torch
    import torch.nn.functional as F
    base = "Conv2d_1a_3x3"
    with torch.no_grad():
        x = F.conv2d(x_nchw, sd[f"{base}.conv.weight"], stride=2)
        x = F.batch_norm(x, sd[f"{base}.bn.running_mean"],
                         sd[f"{base}.bn.running_var"],
                         sd[f"{base}.bn.weight"], sd[f"{base}.bn.bias"],
                         training=False, eps=1e-3)
        return F.relu(x)


def verify() -> int:
    import numpy as np
    import torch
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_platforms", "cpu")  # parity probes belong on CPU
    rc = 0
    rng = np.random.RandomState(0)

    from scene_generation_tpu.models.vgg import (Vgg19Features,
                                                 _torch_checkpoint_path,
                                                 load_torch_vgg19)
    path = _torch_checkpoint_path()
    if path:
        sd = torch.load(path, map_location="cpu", weights_only=True)
        x = rng.rand(2, 64, 64, 3).astype(np.float32)
        m = Vgg19Features()
        params = dict(m.init(jax.random.PRNGKey(0),
                             jnp.asarray(x))["params"])
        params, _ = load_torch_vgg19(params, path=path)
        taps = m.apply({"params": params}, jnp.asarray(x))
        want = torch_vgg19_taps(sd, torch.as_tensor(x.transpose(0, 3, 1, 2)))
        for i, (a, b) in enumerate(zip(taps, want)):
            np.testing.assert_allclose(
                np.asarray(a), b.permute(0, 2, 3, 1).numpy(), atol=1e-3,
                rtol=1e-3, err_msg=f"vgg tap {i}")
        print(f"vgg19: 5-tap parity OK ({path})")
    else:
        print("vgg19: weights not found — skipped")
        rc = 1

    from scene_generation_tpu.metrics_lpips import (Vgg16Features,
                                                    load_lpips_lin,
                                                    load_torch_vgg16)
    v16 = os.path.join(DEFAULT_DEST, "vgg16-397923af.pth")
    v16 = os.environ.get("SGT_VGG16_WEIGHTS", v16)
    if os.path.isfile(v16):
        sd = torch.load(v16, map_location="cpu", weights_only=True)
        x = rng.rand(2, 64, 64, 3).astype(np.float32)
        m = Vgg16Features()
        params = dict(m.init(jax.random.PRNGKey(0),
                             jnp.asarray(x))["params"])
        params, _ = load_torch_vgg16(params, path=v16)
        taps = m.apply({"params": params}, jnp.asarray(x))
        want = torch_vgg16_taps(sd, torch.as_tensor(x.transpose(0, 3, 1, 2)))
        for i, (a, b) in enumerate(zip(taps, want)):
            np.testing.assert_allclose(
                np.asarray(a), b.permute(0, 2, 3, 1).numpy(), atol=1e-3,
                rtol=1e-3, err_msg=f"vgg16 tap {i}")
        print(f"vgg16: 5-tap parity OK ({v16})")
        lins, lin_loaded = load_lpips_lin()
        if lin_loaded:
            assert [w.shape[0] for w in lins] == [64, 128, 256, 512, 512]
            assert all((w >= 0).all() for w in lins)
            print("lpips lin head: shapes + nonnegativity OK")
        else:
            print("lpips lin head: not found — uniform-weight fallback")
            rc = 1
    else:
        print("vgg16: weights not found — skipped")
        rc = 1

    from scene_generation_tpu.models import resnet as R
    rpath = os.environ.get("SGT_RESNET_WEIGHTS")
    if not rpath:
        cand = os.path.join(DEFAULT_DEST, "resnet101-5d3b4d8f.pth")
        rpath = cand if os.path.isfile(cand) else None
    if rpath:
        sd = torch.load(rpath, map_location="cpu", weights_only=True)
        x = rng.rand(2, 224, 224, 3).astype(np.float32)
        model = R.resnet101(num_classes=1000)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.asarray(x), train=False)
        variables, loaded = R.load_torch_resnet(dict(variables), path=rpath)
        assert loaded
        got = model.apply(variables, jnp.asarray(x), train=False)
        want = torch_resnet101_logits(
            sd, torch.as_tensor(x.transpose(0, 3, 1, 2))).numpy()
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-2,
                                   rtol=1e-3)
        print(f"resnet101: full-logits parity OK ({rpath})")
    else:
        print("resnet101: weights not found — skipped")
        rc = 1

    from scene_generation_tpu.models import inception as I
    ipath = os.environ.get("SGT_INCEPTION_WEIGHTS")
    if not ipath:
        cand = os.path.join(DEFAULT_DEST, "inception_v3_google-1a9a5a14.pth")
        ipath = cand if os.path.isfile(cand) else None
    if ipath:
        sd = torch.load(ipath, map_location="cpu", weights_only=True)
        x = rng.rand(2, 299, 299, 3).astype(np.float32)
        m = I.InceptionV3()
        variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           train=False)
        variables, loaded = I.load_torch_inception(dict(variables),
                                                   path=ipath)
        assert loaded
        # Stem parity through the converted weights (standalone BasicConv2d
        # applied with the converted Conv2d_1a_3x3 subtree).
        stem_mod = I.BasicConv2d(32, (3, 3), strides=(2, 2))
        stem = stem_mod.apply(
            {"params": variables["params"]["Conv2d_1a_3x3"],
             "batch_stats": variables["batch_stats"]["Conv2d_1a_3x3"]},
            jnp.asarray(x), False)
        want = torch_inception_stem(
            sd, torch.as_tensor(x.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(np.asarray(stem),
                                   want.permute(0, 2, 3, 1).numpy(),
                                   atol=1e-3, rtol=1e-3)
        print(f"inception_v3: stem parity OK ({ipath})")
    else:
        print("inception_v3: weights not found — skipped")
        rc = 1
    return rc


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("cmd", choices=["fetch", "verify"])
    p.add_argument("--dest", default=DEFAULT_DEST)
    a = p.parse_args()
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    sys.exit(fetch(a.dest) if a.cmd == "fetch" else verify())
