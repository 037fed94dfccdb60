"""Aux model tests: VGG/Inception/ResNet forward shapes + torch weight
converters validated against synthetically generated torchvision-layout
state dicts (no network access needed)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def test_vgg_taps_shapes():
    from scene_generation_tpu.models.vgg import Vgg19Features
    m = Vgg19Features()
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    taps = m.apply(v, x)
    assert [t.shape[-1] for t in taps] == [64, 128, 256, 512, 512]
    assert [t.shape[1] for t in taps] == [64, 32, 16, 8, 4]


def test_vgg_torch_conversion(tmp_path):
    from scene_generation_tpu.models.vgg import Vgg19Features, load_torch_vgg19
    # Build a fake torchvision vgg19 features state dict.
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    sd, idx, in_c = {}, 0, 3
    gen = torch.Generator().manual_seed(0)
    for spec in cfg:
        if spec == "M":
            idx += 1
            continue
        sd[f"features.{idx}.weight"] = torch.randn(spec, in_c, 3, 3,
                                                   generator=gen)
        sd[f"features.{idx}.bias"] = torch.randn(spec, generator=gen)
        in_c = spec
        idx += 2
    path = str(tmp_path / "vgg19.pth")
    torch.save(sd, path)

    m = Vgg19Features()
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3), jnp.float32)
    params = dict(m.init(jax.random.PRNGKey(0), x)["params"])
    params, loaded = load_torch_vgg19(params, path=path)
    assert loaded
    taps = m.apply({"params": params}, x)

    # Oracle: torch conv stack up to relu1_1.
    w = sd["features.0.weight"]
    b = sd["features.0.bias"]
    tx = torch.as_tensor(np.asarray(x).transpose(0, 3, 1, 2))
    want = torch.relu(torch.nn.functional.conv2d(tx, w, b, padding=1))
    np.testing.assert_allclose(np.asarray(taps[0]),
                               want.permute(0, 2, 3, 1).numpy(), atol=1e-4)


def test_inception_converter_covers_all_params(tmp_path):
    """Every conv/bn/fc param of the flax tree must be found in a
    torchvision-layout state dict (name mapping is complete)."""
    from scene_generation_tpu.models.inception import (InceptionV3,
                                                       load_torch_inception)
    m = InceptionV3()
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)),
                       train=False)

    # Fabricate a torch state dict with exactly the keys the converter
    # dereferences, shaped from the flax tree.
    sd = {}

    def fab(tree, prefix):
        for k, v in tree.items():
            p = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                fab(v, p)
            else:
                parts = p.split(".")
                if k == "kernel" and parts[-2] == "conv":
                    sd[".".join(parts[:-1]) + ".weight"] = torch.zeros(
                        v.shape[3], v.shape[2], v.shape[0], v.shape[1])
                elif parts[-2] == "fc":
                    if k == "kernel":
                        sd["fc.weight"] = torch.zeros(v.shape[1], v.shape[0])
                    else:
                        sd["fc.bias"] = torch.zeros(v.shape[0])
                elif parts[-2] == "bn":
                    base = ".".join(parts[:-1])
                    sd[base + ".weight"] = torch.zeros(v.shape[0])
                    sd[base + ".bias"] = torch.zeros(v.shape[0])
                    sd[base + ".running_mean"] = torch.zeros(v.shape[0])
                    sd[base + ".running_var"] = torch.ones(v.shape[0])

    fab(dict(variables["params"]), "")
    path = str(tmp_path / "inception.pth")
    torch.save(sd, path)
    converted, loaded = load_torch_inception(dict(variables), path=path)
    assert loaded
    # All converted conv kernels are zero (came from the fake dict).
    leaves = jax.tree.leaves(converted["params"])
    assert all(float(np.abs(np.asarray(l)).sum()) == 0
               or l.ndim == 0 for l in leaves)


def test_resnet_tiny_forward_and_converter_names():
    from scene_generation_tpu.models.resnet import ResNet, load_torch_resnet
    m = ResNet(stage_sizes=(1, 1, 1, 1), num_classes=5)
    x = jnp.zeros((2, 32, 32, 3))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    logits = m.apply(variables, x, train=False)
    assert logits.shape == (2, 5)

    # Fabricate torch names for the tiny resnet and convert.
    sd = {}

    def torch_name(path):
        parts = []
        for p in path.split("/"):
            if p.startswith("layer") and "_" in p:
                stage, block = p.split("_")
                parts += [stage, block]
            elif p == "downsample_conv":
                parts += ["downsample", "0"]
            elif p == "downsample_bn":
                parts += ["downsample", "1"]
            else:
                parts.append(p)
        return ".".join(parts)

    def fab(tree, prefix):
        for k, v in tree.items():
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                fab(v, p)
            else:
                tname = torch_name(prefix)
                if "fc" in prefix:
                    sd["fc.weight"] = torch.zeros(v.shape[-1], v.shape[0]) \
                        if k == "kernel" else sd.get("fc.weight")
                    sd["fc.bias"] = torch.zeros(5)
                elif k == "kernel":
                    sd[tname + ".weight"] = torch.zeros(
                        v.shape[3], v.shape[2], v.shape[0], v.shape[1])
                elif k in ("scale", "bias"):
                    key = ".weight" if k == "scale" else ".bias"
                    sd[tname + key] = torch.zeros(v.shape[0])
                elif k == "mean":
                    sd[tname + ".running_mean"] = torch.zeros(v.shape[0])
                elif k == "var":
                    sd[tname + ".running_var"] = torch.ones(v.shape[0])

    fab(dict(variables["params"]), "")
    fab(dict(variables["batch_stats"]), "")
    import os
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "resnet.pth")
        torch.save(sd, path)
        converted, loaded = load_torch_resnet(dict(variables), path=path)
    assert loaded


def test_inception_score_math():
    from scene_generation_tpu.trainer.evaluation import (
        inception_score_from_probs)
    # Uniform predictions -> IS == 1.
    probs = np.full((50, 10), 0.1, np.float32)
    mean, std = inception_score_from_probs(probs, splits=5)
    assert abs(mean - 1.0) < 1e-4
    # One-hot diverse predictions -> IS == num classes.
    probs = np.eye(10, dtype=np.float32)[np.arange(50) % 10]
    mean, _ = inception_score_from_probs(probs, splits=1)
    assert abs(mean - 10.0) < 1e-2


def test_fid_math():
    from scene_generation_tpu.metrics_fid import frechet_distance, _stats
    rng = np.random.RandomState(0)
    a = rng.randn(500, 8)
    # Identical distributions -> ~0.
    d0 = frechet_distance(*_stats(a[:250]), *_stats(a[250:]))
    assert d0 < 0.5
    # Shifted mean by delta -> >= |delta|^2.
    b = a + 3.0
    d1 = frechet_distance(*_stats(a), *_stats(b))
    assert d1 > 8 * 9 * 0.9  # dims * delta^2, loose


def test_fid_accumulator_with_stub_features():
    from scene_generation_tpu.metrics_fid import FIDAccumulator
    rng = np.random.RandomState(1)
    fid = FIDAccumulator(features_fn=lambda x: np.asarray(x).reshape(
        x.shape[0], -1)[:, :16])
    real = rng.rand(8, 4, 4, 3).astype(np.float32)
    fake = rng.rand(8, 4, 4, 3).astype(np.float32) + 0.5
    fid.add_real(real)
    fid.add_fake(fake)
    same = FIDAccumulator(features_fn=fid.features_fn)
    same.add_real(real)
    same.add_fake(real)
    assert fid.compute() > same.compute()


def test_vgg_full_tap_parity_random_weights(tmp_path):
    """All five perceptual-loss taps vs the state-dict-driven torch oracle
    (scripts/fetch_pretrained.py) on random torchvision-layout weights —
    validates converter AND oracle so the real-weight test is meaningful."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.fetch_pretrained import torch_vgg19_taps
    from scene_generation_tpu.models.vgg import Vgg19Features, load_torch_vgg19

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    sd, idx, in_c = {}, 0, 3
    gen = torch.Generator().manual_seed(1)
    for spec in cfg:
        if spec == "M":
            idx += 1
            continue
        sd[f"features.{idx}.weight"] = torch.randn(
            spec, in_c, 3, 3, generator=gen) * 0.05
        sd[f"features.{idx}.bias"] = torch.randn(spec, generator=gen) * 0.05
        in_c = spec
        idx += 2
    path = str(tmp_path / "vgg19.pth")
    torch.save(sd, path)

    x = np.random.RandomState(3).rand(1, 64, 64, 3).astype(np.float32)
    m = Vgg19Features()
    params = dict(m.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"])
    params, loaded = load_torch_vgg19(params, path=path)
    assert loaded
    taps = m.apply({"params": params}, jnp.asarray(x))
    want = torch_vgg19_taps(sd, torch.as_tensor(x.transpose(0, 3, 1, 2)))
    assert len(want) == 5
    for i, (a, b) in enumerate(zip(taps, want)):
        np.testing.assert_allclose(np.asarray(a),
                                   b.permute(0, 2, 3, 1).numpy(),
                                   atol=1e-3, rtol=1e-3,
                                   err_msg=f"tap {i}")


def test_resnet101_full_logits_parity_random_weights(tmp_path):
    """Full ResNet101 logits vs the state-dict-driven torch oracle on
    random weights (small input keeps CPU time sane)."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.fetch_pretrained import torch_resnet101_logits
    from scene_generation_tpu.models import resnet as R

    model = R.resnet101(num_classes=1000)
    x = np.random.RandomState(4).rand(1, 64, 64, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           train=False)

    # Fabricate a full random torchvision-layout state dict from the flax
    # tree shapes (reusing the converter's own name mapping inverse).
    gen = torch.Generator().manual_seed(2)
    sd = {}

    def torch_name(path):
        parts = []
        for p in path.split("/"):
            if p.startswith("layer") and "_" in p:
                stage, block = p.split("_")
                parts += [stage, block]
            elif p == "downsample_conv":
                parts += ["downsample", "0"]
            elif p == "downsample_bn":
                parts += ["downsample", "1"]
            else:
                parts.append(p)
        return ".".join(parts)

    def fab(tree, prefix):
        for k, v in tree.items():
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                fab(v, p)
                continue
            tname = torch_name(prefix)
            if "fc" in prefix:
                if k == "kernel":
                    sd["fc.weight"] = torch.randn(v.shape[-1], v.shape[0],
                                                  generator=gen) * 0.05
                else:
                    sd["fc.bias"] = torch.randn(v.shape[0],
                                                generator=gen) * 0.05
            elif k == "kernel":
                sd[tname + ".weight"] = torch.randn(
                    v.shape[3], v.shape[2], v.shape[0], v.shape[1],
                    generator=gen) * 0.05
            elif k in ("scale", "bias"):
                key = ".weight" if k == "scale" else ".bias"
                sd[tname + key] = torch.randn(v.shape[0],
                                              generator=gen) * 0.1 + 1.0
            elif k == "mean":
                sd[tname + ".running_mean"] = torch.randn(
                    v.shape[0], generator=gen) * 0.1
            elif k == "var":
                sd[tname + ".running_var"] = torch.rand(
                    v.shape[0], generator=gen) + 0.5

    fab(dict(variables["params"]), "")
    fab(dict(variables["batch_stats"]), "")
    path = str(tmp_path / "resnet101.pth")
    torch.save(sd, path)

    variables, loaded = R.load_torch_resnet(dict(variables), path=path)
    assert loaded
    got = model.apply(variables, jnp.asarray(x), train=False)
    want = torch_resnet101_logits(
        sd, torch.as_tensor(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-3, rtol=1e-3)


def test_shallow_features_fallback_discriminates():
    """The no-weights FID fallback must stay input-dependent (deep
    random-init Inception pool3 features collapse to constants — std
    ~3e-6 across images — which made FID degenerate to exactly 0)."""
    from scene_generation_tpu.metrics_fid import (FIDAccumulator,
                                                  create_shallow_features_fn)
    fn = create_shallow_features_fn()
    rng = np.random.RandomState(0)
    a = (rng.rand(8, 64, 64, 3).astype(np.float32)) * 2 - 1
    f = np.asarray(fn(a))
    assert f.shape == (8, 960)
    # Input-dependence: per-feature std across the batch is far from 0.
    assert float(f.std(axis=0).mean()) > 1e-3
    # Determinism (fixed seed): two instances agree.
    f2 = np.asarray(create_shallow_features_fn()(a))
    np.testing.assert_allclose(f, f2, rtol=1e-6)

    def fid_of(fake):
        acc = FIDAccumulator(features_fn=fn)
        acc.add_real(a)
        acc.add_fake(fake)
        return acc.compute()

    same = fid_of(a)
    shifted = fid_of(np.clip(a * 0.2, -1, 1))
    assert abs(same) < 1e-3
    assert shifted > 10 * max(same, 1e-6)
