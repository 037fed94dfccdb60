"""Model-level shape/behavior tests (SURVEY.md §4 implication (b))."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scene_generation_tpu.config import test_config, tiny_config
from scene_generation_tpu.data import synthetic_batch
from scene_generation_tpu.models import SceneModel
from scene_generation_tpu.models.discriminators import (
    AcCropDiscriminator, MultiscaleDiscriminator, MultiscaleMaskDiscriminator)
from scene_generation_tpu.models.layers import CNN, MaskedBatchNorm


@pytest.fixture(scope="module")
def setup():
    cfg = test_config()
    batch = synthetic_batch(cfg, seed=0, batch_size=2)
    model = SceneModel(cfg.model)
    noise = jnp.zeros((cfg.model.mask_noise_dim,))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch.objs),
        jnp.asarray(batch.triples), jnp.asarray(batch.attributes),
        jnp.asarray(batch.obj_mask), jnp.asarray(batch.triple_mask), noise,
        imgs=jnp.asarray(batch.imgs), boxes_gt=jnp.asarray(batch.boxes),
        masks_gt=jnp.asarray(batch.masks))
    return cfg, batch, model, variables, noise


def test_forward_train_shapes(setup):
    cfg, batch, model, variables, noise = setup
    mc = cfg.model
    n, o = batch.objs.shape
    h, w = mc.image_size
    out, _ = model.apply(
        variables, jnp.asarray(batch.objs), jnp.asarray(batch.triples),
        jnp.asarray(batch.attributes), jnp.asarray(batch.obj_mask),
        jnp.asarray(batch.triple_mask), noise, imgs=jnp.asarray(batch.imgs),
        boxes_gt=jnp.asarray(batch.boxes), masks_gt=jnp.asarray(batch.masks),
        mutable=["batch_stats"])
    assert out.imgs_pred.shape == (n, h, w, 3)
    assert out.boxes_pred.shape == (n, o, 4)
    assert out.masks_pred.shape == (n, o, mc.mask_size, mc.mask_size)
    assert out.layout.shape == (n, h, w, mc.layout_nc)
    assert out.obj_repr.shape == (n, o, mc.rep_size)
    # tanh output range; sigmoid masks; ReLU-terminated boxes >= 0
    # (build_mlp final nonlinearity quirk, layers.py:221-228).
    assert float(jnp.abs(out.imgs_pred).max()) <= 1.0
    assert 0.0 <= float(out.masks_pred.min())
    assert float(out.masks_pred.max()) <= 1.0
    assert float(out.boxes_pred.min()) >= 0.0


def test_forward_test_mode_uses_features(setup):
    cfg, batch, model, variables, noise = setup
    mc = cfg.model
    n, o = batch.objs.shape
    feats = jnp.full((n, o, mc.rep_size), 0.5)
    out = model.apply(
        variables, jnp.asarray(batch.objs), jnp.asarray(batch.triples),
        jnp.asarray(batch.attributes), jnp.asarray(batch.obj_mask),
        jnp.asarray(batch.triple_mask), noise, test_mode=True, train=False,
        features=feats, features_mask=jnp.ones((n, o)))
    assert out.layout is None and out.layout_wrong is None
    np.testing.assert_allclose(np.asarray(out.obj_repr), 0.5)


def test_discriminator_shapes():
    cfg = tiny_config()
    mc, dc = cfg.model, cfg.discriminator
    rng = jax.random.PRNGKey(0)
    n, o = 2, cfg.data.max_objs
    h, w = mc.image_size

    d_img = MultiscaleDiscriminator(ndf=dc.ndf, n_layers=dc.n_layers_d,
                                    num_d=2)
    x = jnp.zeros((n, h, w, mc.layout_nc + 3))
    v = d_img.init(rng, x)
    scales = d_img.apply(v, x)
    assert len(scales) == 2
    assert len(scales[0]) == dc.n_layers_d + 2
    assert scales[0][-1].shape[-1] == 1
    # Second scale sees a half-resolution input.
    assert scales[1][0].shape[1] < scales[0][0].shape[1]

    d_mask = MultiscaleMaskDiscriminator(ndf=dc.ndf_mask,
                                         n_layers=dc.n_layers_d_mask)
    m = jnp.zeros((n * o, mc.mask_size, mc.mask_size, 1))
    cond = jnp.zeros((n * o, mc.num_objs))
    v = d_mask.init(rng, m, cond)
    out = d_mask.apply(v, m, cond)
    assert len(out) == 1 and out[0][-1].shape[-1] == 1

    d_obj = AcCropDiscriminator(num_objects=mc.num_objs,
                                object_size=dc.crop_size, arch=dc.d_obj_arch)
    imgs = jnp.zeros((n, h, w, 3))
    boxes = jnp.tile(jnp.asarray([0.2, 0.2, 0.8, 0.8]), (n, o, 1))
    v = d_obj.init(rng, imgs, boxes, jnp.ones((n, o)))
    (scores, logits, crops), _ = d_obj.apply(
        v, imgs, boxes, jnp.ones((n, o)), mutable=["batch_stats"])
    assert scores.shape == (n, o)
    assert logits.shape == (n, o, mc.num_objs)
    assert crops.shape == (n, o, dc.crop_size, dc.crop_size, 3)


def test_cnn_dsl_valid_padding_sizes():
    """Reference arch 'C4-64-2,C4-128-2,C4-256-2' at 64x64 valid padding
    yields 31 -> 14 -> 6 spatial (torch conv arithmetic)."""
    cnn = CNN("C4-8-2,C4-16-2,C4-32-2", padding="valid")
    x = jnp.zeros((1, 64, 64, 3))
    v = cnn.init(jax.random.PRNGKey(0), x)
    y, _ = cnn.apply(v, x, mutable=["batch_stats"])
    assert y.shape == (1, 6, 6, 32)


def test_masked_batchnorm_ignores_masked_rows():
    bn = MaskedBatchNorm()
    x = jnp.concatenate([jnp.ones((2, 3)), jnp.full((2, 3), 100.0)])
    w_all = jnp.ones((4,))
    w_half = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    v = bn.init(jax.random.PRNGKey(0), x, weights=w_all)
    _, mut = bn.apply(v, x, weights=w_half, mutable=["batch_stats"])
    # Stats computed only from the first two rows (mean 1, var 0).
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["mean"]),
                               0.1 * np.ones(3), atol=1e-6)  # momentum 0.1
