"""Factored rank-O generator stem: parity with the dense layout path.

The composed layout is rank-O in the object axis by construction
(ops/layout.py masks_to_layout_weights), so contracting the generator's
7x7 stem against the (N,H,W,O) weight field instead of the materialized
(N,H,W,204) layout is the SAME linear map, reassociated. These tests pin
that equivalence at every level: op (StemConv), weights-vs-layout, and
the full SceneModel forward in both test and train modes — plus gradient
health through the factored train path. CPU float32 throughout.
"""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scene_generation_tpu.config import test_config
from scene_generation_tpu.data import synthetic_batch
from scene_generation_tpu.models import SceneModel
from scene_generation_tpu.models.generators import StemConv
from scene_generation_tpu.ops.layout import (masks_to_layout,
                                             masks_to_layout_weights)


def test_stemconv_dense_matches_nn_conv_exactly():
    from flax import linen as nn
    from scene_generation_tpu.models.layers import conv_init_gan
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 12))
    ref = nn.Conv(8, (7, 7), padding="VALID", kernel_init=conv_init_gan)
    rv = ref.init(jax.random.PRNGKey(2), x)
    # Same param tree ({kernel, bias}) -> same variables drive both.
    np.testing.assert_array_equal(np.asarray(ref.apply(rv, x)),
                                  np.asarray(StemConv(8).apply(rv, x)))


@pytest.mark.parametrize("impl", ["patches", "slices", "grouped", "shifts",
                                  "pallas_interpret"])
def test_stemconv_factored_matches_dense(impl):
    n, h, w, o, d, c = 2, 20, 24, 9, 50, 8
    wmap = jax.random.uniform(jax.random.PRNGKey(3), (n, h + 6, w + 6, o))
    vecs = jax.random.normal(jax.random.PRNGKey(4), (n, o, d))
    layout = jnp.einsum("nhwo,nod->nhwd", wmap, vecs)
    sc = StemConv(c, factored_impl=impl)
    variables = sc.init(jax.random.PRNGKey(5), layout)
    dense = sc.apply(variables, layout)
    fact = sc.apply(variables, weights=wmap, vecs=vecs)
    np.testing.assert_allclose(np.asarray(fact), np.asarray(dense),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("tile", [8, 16, 32])
def test_stem_pallas_tile_variants_identical(tile):
    """tile_h is a pure performance knob (scripts/stem_tile_sweep.py):
    every tile height must produce identical output."""
    from scene_generation_tpu.ops.pallas.stem import stem_pallas
    h = w = 32
    o, c = 9, 16
    wmap = jax.random.uniform(jax.random.PRNGKey(6), (2, h + 6, w + 6, o))
    g = jax.random.normal(jax.random.PRNGKey(7), (2, 7, 7, o, c))
    base = np.asarray(stem_pallas(wmap, g, interpret=True, tile_h=8))
    got = np.asarray(stem_pallas(wmap, g, interpret=True, tile_h=tile))
    np.testing.assert_array_equal(got, base)


@pytest.mark.parametrize("test_mode", [False, True])
def test_weights_contract_to_layout(test_mode):
    cfg = test_config()
    batch = synthetic_batch(cfg, seed=0, batch_size=2)
    n, o = batch.objs.shape
    vecs = jax.random.normal(jax.random.PRNGKey(0), (n, o, 13))
    boxes = jnp.asarray(batch.boxes)
    masks = jnp.asarray(batch.masks)
    om = jnp.asarray(batch.obj_mask)
    h = cfg.model.image_size[0]
    wmap = masks_to_layout_weights(vecs, boxes, masks, om, h,
                                   test_mode=test_mode)
    ref = masks_to_layout(vecs, boxes, masks, om, h, test_mode=test_mode)
    got = jnp.einsum("nohw,nod->nhwd", wmap, vecs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    # Invalid object slots contribute no weight.
    invalid = np.asarray(1.0 - om)[:, :, None, None]
    assert float(np.abs(np.asarray(wmap) * invalid).max()) == 0.0


@pytest.fixture(scope="module")
def pair():
    cfg = test_config()
    batch = synthetic_batch(cfg, seed=0, batch_size=2)
    mc_f = dataclasses.replace(cfg.model, factored_stem=True)
    mc_d = dataclasses.replace(cfg.model, factored_stem=False,
                               test_compositor_backend="xla")
    noise = jnp.zeros((cfg.model.mask_noise_dim,))
    model_f, model_d = SceneModel(mc_f), SceneModel(mc_d)
    # Param trees are identical (StemConv mirrors nn.Conv's {kernel,bias})
    # so one set of variables drives both models.
    variables = model_f.init(
        jax.random.PRNGKey(0), jnp.asarray(batch.objs),
        jnp.asarray(batch.triples), jnp.asarray(batch.attributes),
        jnp.asarray(batch.obj_mask), jnp.asarray(batch.triple_mask), noise,
        imgs=jnp.asarray(batch.imgs), boxes_gt=jnp.asarray(batch.boxes),
        masks_gt=jnp.asarray(batch.masks))
    return cfg, batch, model_f, model_d, variables, noise


def _args(batch, noise):
    return (jnp.asarray(batch.objs), jnp.asarray(batch.triples),
            jnp.asarray(batch.attributes), jnp.asarray(batch.obj_mask),
            jnp.asarray(batch.triple_mask), noise)


def test_model_test_mode_parity(pair):
    cfg, batch, model_f, model_d, variables, noise = pair
    n, o = batch.objs.shape
    feats = jnp.full((n, o, cfg.model.rep_size), 0.25)
    kw = dict(test_mode=True, train=False, features=feats,
              features_mask=jnp.ones((n, o)),
              boxes_gt=jnp.asarray(batch.boxes), use_gt_box=True)
    out_f = model_f.apply(variables, *_args(batch, noise), **kw)
    out_d = model_d.apply(variables, *_args(batch, noise), **kw)
    np.testing.assert_allclose(np.asarray(out_f.imgs_pred),
                               np.asarray(out_d.imgs_pred),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_f.layout_pred),
                               np.asarray(out_d.layout_pred),
                               atol=1e-5, rtol=1e-5)


def test_model_train_mode_parity(pair):
    cfg, batch, model_f, model_d, variables, noise = pair
    kw = dict(imgs=jnp.asarray(batch.imgs),
              boxes_gt=jnp.asarray(batch.boxes),
              masks_gt=jnp.asarray(batch.masks), mutable=["batch_stats"])
    out_f, _ = model_f.apply(variables, *_args(batch, noise), **kw)
    out_d, _ = model_d.apply(variables, *_args(batch, noise), **kw)
    np.testing.assert_allclose(np.asarray(out_f.imgs_pred),
                               np.asarray(out_d.imgs_pred),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_f.layout),
                               np.asarray(out_d.layout),
                               atol=1e-5, rtol=1e-5)


def test_model_pallas_stem_backend_parity(pair):
    """test_stem_backend routes the test-mode generator stem through the
    fused Pallas kernel (interpret mode here) with identical output."""
    cfg, batch, model_f, _, variables, noise = pair
    mc_p = dataclasses.replace(cfg.model,
                               test_stem_backend="pallas_interpret")
    model_p = SceneModel(mc_p)
    n, o = batch.objs.shape
    feats = jnp.full((n, o, cfg.model.rep_size), 0.25)
    kw = dict(test_mode=True, train=False, features=feats,
              features_mask=jnp.ones((n, o)),
              boxes_gt=jnp.asarray(batch.boxes), use_gt_box=True)
    out_p = model_p.apply(variables, *_args(batch, noise), **kw)
    out_f = model_f.apply(variables, *_args(batch, noise), **kw)
    np.testing.assert_allclose(np.asarray(out_p.imgs_pred),
                               np.asarray(out_f.imgs_pred),
                               atol=2e-4, rtol=1e-4)


def test_factored_train_grad_finite_nonzero(pair):
    cfg, batch, model_f, _, variables, noise = pair

    def loss_fn(params):
        out, _ = model_f.apply(
            {**variables, "params": params}, *_args(batch, noise),
            imgs=jnp.asarray(batch.imgs),
            boxes_gt=jnp.asarray(batch.boxes),
            masks_gt=jnp.asarray(batch.masks), mutable=["batch_stats"])
        return jnp.mean(out.imgs_pred ** 2) + jnp.mean(out.layout ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    stem = grads["layout_to_image"]["Conv_0"]["kernel"]
    assert float(jnp.abs(stem).max()) > 0.0
