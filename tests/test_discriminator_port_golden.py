"""Discriminator-side reference-weight port goldens.

Companion to tests/test_model_port_golden.py: builds the ACTUAL reference
discriminators (AcCropDiscriminator, define_D MultiscaleDiscriminator,
define_mask_D MultiscaleMaskDiscriminator — reference
discriminators.py:10-51,66-84) at reference-default hyperparameters,
converts their complete state_dicts through convert.py, and asserts
forward parity in f64 — every per-stage feature map of every scale (the
feature-matching losses consume them all, so each must match, not just
the score head). With the generator golden this makes a reference
checkpoint fully portable: serving AND training-resume state.
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_DIR = os.environ.get("SGT_REFERENCE_DIR", "/root/reference")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_DIR, "scene_generation")),
    reason="reference tree unavailable")

NUM_OBJS = 10
IMG = 64
MASK = 32
D_IMG_NC = NUM_OBJS + 8 + 3  # num_objs + rep_size + output_nc


@pytest.fixture(scope="module")
def f64():
    import jax
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


@pytest.fixture(scope="module")
def ref_modules(f64):
    sys.path.insert(0, REF_DIR)
    orig = (torch.cuda.is_available, torch.nn.Module.cuda, torch.Tensor.cuda)
    torch.cuda.is_available = lambda: True
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.cuda = lambda self, *a, **k: self

    from scene_generation.discriminators import (AcCropDiscriminator,
                                                 define_D, define_mask_D)

    vocab = {"object_to_idx": {f"c{i}": i for i in range(NUM_OBJS)}}
    torch.manual_seed(0)
    d_obj = AcCropDiscriminator(vocab, "C4-64-2,C4-128-2,C4-256-2",
                                normalization="batch",
                                activation="leakyrelu-0.2",
                                object_size=32, padding="valid")
    d_img = define_D(D_IMG_NC, 64, 3, norm="instance", use_sigmoid=False,
                     num_D=2)
    d_mask = define_mask_D(1, 64, 2, norm="instance", use_sigmoid=False,
                           num_D=1, num_objects=NUM_OBJS)
    g = torch.Generator().manual_seed(1)
    for mod in d_obj.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.weight.data = 1.0 + 0.2 * torch.randn(mod.weight.shape,
                                                      generator=g)
            mod.bias.data = 0.2 * torch.randn(mod.bias.shape, generator=g)
            mod.running_mean = 0.5 * torch.randn(mod.running_mean.shape,
                                                 generator=g)
            mod.running_var = 0.5 + torch.rand(mod.running_var.shape,
                                               generator=g)
    for m in (d_obj, d_img, d_mask):
        m.double()
        m.eval()
    yield d_obj, d_img, d_mask
    (torch.cuda.is_available, torch.nn.Module.cuda,
     torch.Tensor.cuda) = orig
    sys.path.remove(REF_DIR)


def _gs_torch10():
    """grid_sample pinned to pytorch==1.0.0 semantics (see
    test_model_port_golden._torch_forward)."""
    orig = torch.nn.functional.grid_sample

    def gs(input, grid, **kw):
        kw["align_corners"] = True
        if input.dtype != grid.dtype:
            input = input.to(grid.dtype)
        return orig(input, grid, **kw)

    return orig, gs


def test_d_obj_port(ref_modules, f64):
    import jax.numpy as jnp
    from scene_generation_tpu.convert import convert_reference_d_obj
    from scene_generation_tpu.models.discriminators import AcCropDiscriminator

    d_obj_ref, _, _ = ref_modules
    variables = convert_reference_d_obj(d_obj_ref.state_dict(),
                                        arch="C4-64-2,C4-128-2,C4-256-2",
                                        normalization="batch")

    rng = np.random.RandomState(3)
    imgs = rng.uniform(-1, 1, (2, 3, IMG, IMG))
    x0, y0 = rng.uniform(0.05, 0.4, (2, 2, 3))
    boxes = np.stack([x0, y0, x0 + rng.uniform(0.3, 0.5, (2, 3)),
                      y0 + rng.uniform(0.3, 0.5, (2, 3))], axis=-1)
    objs_flat = torch.from_numpy(np.array([1, 2, 3, 4, 5, 6]))
    obj_to_img = torch.from_numpy(np.array([0, 0, 0, 1, 1, 1]))

    orig, gs = _gs_torch10()
    torch.nn.functional.grid_sample = gs
    try:
        with torch.no_grad():
            scores_ref, _, crops_ref = d_obj_ref(
                torch.from_numpy(imgs), objs_flat,
                torch.from_numpy(boxes.reshape(6, 4)), obj_to_img)
    finally:
        torch.nn.functional.grid_sample = orig

    mine = AcCropDiscriminator(num_objects=NUM_OBJS, object_size=32,
                               normalization="batch", dtype=jnp.float64)
    scores, logits, crops = mine.apply(
        variables, jnp.asarray(imgs.transpose(0, 2, 3, 1)),
        jnp.asarray(boxes), jnp.ones((2, 3)), train=False)
    # 1e-5: the REFERENCE grid is f32-rounded even under a double model —
    # bilinear.py tensor_linspace builds torch.linspace weights in f32 and
    # then casts (`.to(start)`, bilinear.py:266-268); our separable
    # matrices are exact f64, so the ~2e-6 residual is the reference's own
    # quantization.
    np.testing.assert_allclose(
        np.asarray(crops).reshape(6, 32, 32, 3).transpose(0, 3, 1, 2),
        crops_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(scores).reshape(6, 1),
                               scores_ref.numpy(), atol=1e-5)
    assert np.asarray(logits).shape == (2, 3, NUM_OBJS)


def test_d_img_port(ref_modules, f64):
    import jax.numpy as jnp
    from scene_generation_tpu.convert import convert_reference_multiscale_d
    from scene_generation_tpu.models.discriminators import (
        MultiscaleDiscriminator)

    _, d_img_ref, _ = ref_modules
    variables = convert_reference_multiscale_d(d_img_ref.state_dict(),
                                               num_d=2, n_layers=3)
    rng = np.random.RandomState(4)
    x = rng.uniform(-1, 1, (2, D_IMG_NC, IMG, IMG))
    with torch.no_grad():
        ref_out = d_img_ref(torch.from_numpy(x))

    mine = MultiscaleDiscriminator(num_d=2, n_layers=3, dtype=jnp.float64)
    out = mine.apply({"params": variables["params"]},
                     jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(out) == len(ref_out) == 2
    for scale, (got_list, want_list) in enumerate(zip(out, ref_out)):
        assert len(got_list) == len(want_list)
        for j, (got, want) in enumerate(zip(got_list, want_list)):
            np.testing.assert_allclose(
                np.asarray(got).transpose(0, 3, 1, 2), want.numpy(),
                atol=1e-9, err_msg=f"scale {scale} stage {j}")


def test_d_mask_port(ref_modules, f64):
    import jax.numpy as jnp
    from scene_generation_tpu.convert import convert_reference_multiscale_d
    from scene_generation_tpu.models.discriminators import (
        MultiscaleMaskDiscriminator)

    _, _, d_mask_ref = ref_modules
    variables = convert_reference_multiscale_d(d_mask_ref.state_dict(),
                                               num_d=1, n_layers=2)
    rng = np.random.RandomState(5)
    x = rng.uniform(0, 1, (6, 1, MASK, MASK))
    cond = np.zeros((6, NUM_OBJS))
    cond[np.arange(6), [1, 2, 3, 4, 5, 6]] = 1.0
    with torch.no_grad():
        ref_out = d_mask_ref(torch.from_numpy(x), torch.from_numpy(cond))

    mine = MultiscaleMaskDiscriminator(num_d=1, n_layers=2,
                                       dtype=jnp.float64)
    out = mine.apply({"params": variables["params"]},
                     jnp.asarray(x.transpose(0, 2, 3, 1)),
                     jnp.asarray(cond))
    assert len(out) == len(ref_out) == 1
    for j, (got, want) in enumerate(zip(out[0], ref_out[0])):
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want.numpy(),
            atol=1e-9, err_msg=f"stage {j}")
