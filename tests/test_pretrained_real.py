"""Numerical-tolerance parity of the flax aux-model ports against REAL
torchvision weight files (SURVEY.md §7 "conversion + numerical tolerance
tests"). Skipped when the weights are absent (zero-egress environments);
install them with scripts/fetch_pretrained.py."""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts.fetch_pretrained import (DEFAULT_DEST, torch_inception_stem,
                                      torch_resnet101_logits,
                                      torch_vgg19_taps)


def _find(env, fname):
    p = os.environ.get(env)
    if p and os.path.isfile(p):
        return p
    cand = os.path.join(DEFAULT_DEST, fname)
    return cand if os.path.isfile(cand) else None


VGG = _find("SGT_VGG19_WEIGHTS", "vgg19-dcbb9e9d.pth")
RESNET = _find("SGT_RESNET_WEIGHTS", "resnet101-5d3b4d8f.pth")
INCEPTION = _find("SGT_INCEPTION_WEIGHTS", "inception_v3_google-1a9a5a14.pth")


@pytest.mark.skipif(VGG is None, reason="vgg19 weights not installed")
def test_vgg19_real_tap_parity():
    import jax
    import jax.numpy as jnp
    from scene_generation_tpu.models.vgg import (Vgg19Features,
                                                 load_torch_vgg19)
    sd = torch.load(VGG, map_location="cpu", weights_only=True)
    x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    m = Vgg19Features()
    params = dict(m.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"])
    params, loaded = load_torch_vgg19(params, path=VGG)
    assert loaded
    taps = m.apply({"params": params}, jnp.asarray(x))
    want = torch_vgg19_taps(sd, torch.as_tensor(x.transpose(0, 3, 1, 2)))
    assert len(want) == 5
    for i, (a, b) in enumerate(zip(taps, want)):
        np.testing.assert_allclose(np.asarray(a),
                                   b.permute(0, 2, 3, 1).numpy(),
                                   atol=1e-3, rtol=1e-3,
                                   err_msg=f"tap {i}")


@pytest.mark.skipif(RESNET is None, reason="resnet101 weights not installed")
def test_resnet101_real_logits_parity():
    import jax
    import jax.numpy as jnp
    from scene_generation_tpu.models import resnet as R
    sd = torch.load(RESNET, map_location="cpu", weights_only=True)
    x = np.random.RandomState(1).rand(2, 224, 224, 3).astype(np.float32)
    model = R.resnet101(num_classes=1000)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           train=False)
    variables, loaded = R.load_torch_resnet(dict(variables), path=RESNET)
    assert loaded
    got = model.apply(variables, jnp.asarray(x), train=False)
    want = torch_resnet101_logits(
        sd, torch.as_tensor(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-2, rtol=1e-3)


@pytest.mark.skipif(INCEPTION is None,
                    reason="inception_v3 weights not installed")
def test_inception_real_stem_parity():
    import jax
    import jax.numpy as jnp
    from scene_generation_tpu.models import inception as I
    sd = torch.load(INCEPTION, map_location="cpu", weights_only=True)
    x = np.random.RandomState(2).rand(2, 299, 299, 3).astype(np.float32)
    m = I.InceptionV3()
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    variables, loaded = I.load_torch_inception(dict(variables),
                                               path=INCEPTION)
    assert loaded
    stem_mod = I.BasicConv2d(32, (3, 3), strides=(2, 2))
    stem = stem_mod.apply(
        {"params": variables["params"]["Conv2d_1a_3x3"],
         "batch_stats": variables["batch_stats"]["Conv2d_1a_3x3"]},
        jnp.asarray(x), False)
    want = torch_inception_stem(sd, torch.as_tensor(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(stem),
                               want.permute(0, 2, 3, 1).numpy(),
                               atol=1e-3, rtol=1e-3)
