"""LPIPS diversity metric: math properties + VGG16 converter/oracle
cross-validation on random torchvision-layout weights."""
import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scene_generation_tpu.metrics_lpips import (Vgg16Features,
                                                create_lpips_fn,
                                                load_lpips_lin,
                                                load_torch_vgg16)


def _fake_vgg16_sd(seed=0):
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    sd, idx, in_c = {}, 0, 3
    gen = torch.Generator().manual_seed(seed)
    for spec in cfg:
        if spec == "M":
            idx += 1
            continue
        sd[f"features.{idx}.weight"] = torch.randn(
            spec, in_c, 3, 3, generator=gen) * 0.05
        sd[f"features.{idx}.bias"] = torch.randn(spec, generator=gen) * 0.05
        in_c = spec
        idx += 2
    return sd


def test_vgg16_tap_parity_random_weights(tmp_path):
    from scripts.fetch_pretrained import torch_vgg16_taps
    sd = _fake_vgg16_sd()
    path = str(tmp_path / "vgg16.pth")
    torch.save(sd, path)
    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    m = Vgg16Features()
    params = dict(m.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"])
    params, loaded = load_torch_vgg16(params, path=path)
    assert loaded
    taps = m.apply({"params": params}, jnp.asarray(x))
    want = torch_vgg16_taps(sd, torch.as_tensor(x.transpose(0, 3, 1, 2)))
    assert len(want) == 5
    assert [t.shape[-1] for t in taps] == [64, 128, 256, 512, 512]
    for i, (a, b) in enumerate(zip(taps, want)):
        np.testing.assert_allclose(np.asarray(a),
                                   b.permute(0, 2, 3, 1).numpy(),
                                   atol=1e-3, rtol=1e-3,
                                   err_msg=f"tap {i}")


def test_lpips_lin_loader(tmp_path):
    sd = {f"lin{i}.model.1.weight": torch.rand(1, c, 1, 1)
          for i, c in enumerate([64, 128, 256, 512, 512])}
    path = str(tmp_path / "lpips_vgg_lin.pth")
    torch.save(sd, path)
    lins, loaded = load_lpips_lin(path)
    assert loaded
    assert [w.shape for w in lins] == [(64,), (128,), (256,), (512,), (512,)]
    # Fallback: uniform weights, flagged unloaded.
    lins, loaded = load_lpips_lin("/nonexistent/x.pth")
    assert not loaded and abs(float(lins[0].sum()) - 1.0) < 1e-5


def test_lpips_distance_properties():
    lpips_fn, _ = create_lpips_fn()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
    y = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
    d_xx = np.asarray(lpips_fn(x, x))
    d_xy = np.asarray(lpips_fn(x, y))
    d_yx = np.asarray(lpips_fn(y, x))
    assert d_xx.shape == (2,)
    np.testing.assert_allclose(d_xx, 0.0, atol=1e-6)      # identity
    assert (d_xy > 1e-4).all()                            # discrimination
    np.testing.assert_allclose(d_xy, d_yx, rtol=1e-5)     # symmetry
    # Small perturbation < big perturbation (monotone in corruption).
    noise = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    d_small = np.asarray(lpips_fn(x, x + 0.05 * noise))
    d_big = np.asarray(lpips_fn(x, x + 0.5 * noise))
    assert (d_small < d_big).all()
