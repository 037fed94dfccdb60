"""The adversarial train step: one jitted function doing the generator
update and the three discriminator updates.

Reproduces the reference step structure (train.py:186-215 +
trainer.py:205-325) with ``jax.lax.stop_gradient`` standing in for
``.detach()``:

  1. G forward + loss (box MSE x use_gt, VGG perceptual, D_obj GAN + AC,
     D_mask GAN + feature matching, D_img GAN + feature matching) -> Adam.
  2. Appearance pool query (reference queries inside forward, model.py:170).
  3. D_mask step (trainer.py:281-300).
  4. D_obj step (trainer.py:265-279; note the reference feeds GT boxes to the
     fake branch — ``boxes_pred_detach = boxes.detach()``, train.py:210 —
     preserved here).
  5. D_img step (trainer.py:302-325): fake image 0.25 + wrong-texture 0.25 +
     real 0.5.

The ``use_gt`` coin flip that zeroes attributes half the time
(train.py:195-197) is a traced bernoulli so the step stays compiled once.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from scene_generation_tpu import losses as L
from scene_generation_tpu.data.batching import Batch
from scene_generation_tpu.ops.images import wire_to_float
from scene_generation_tpu.ops.layout import masks_to_layout
from scene_generation_tpu.trainer.pools import pool_query
from scene_generation_tpu.trainer.train_state import Modules, TrainState

TrainMetrics = Dict[str, jax.Array]


def make_train_step(mods: Modules, donate: bool = True):
    """Build the jitted train step for a module bundle."""
    step = partial(_train_step, mods)
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def _train_step(mods: Modules, state: TrainState, batch: Batch
                ) -> Tuple[TrainState, TrainMetrics]:
    cfg = mods.cfg
    mc, lw, dc = cfg.model, cfg.loss, cfg.discriminator
    gan_g_loss, gan_d_loss = L.get_gan_losses(dc.gan_loss_type)
    use_lsgan = not dc.no_lsgan
    h, w = mc.image_size
    metrics: TrainMetrics = {}

    rng, r_noise, r_gt, r_pool = jax.random.split(state.rng, 4)
    use_gt = jax.random.bernoulli(r_gt).astype(jnp.float32)
    attributes = jnp.asarray(batch.attributes) * use_gt
    mask_noise = jax.random.normal(r_noise, (mc.mask_noise_dim,))

    # uint8 wire format -> [-1, 1] float on device: the ONLY place the raw
    # batch image is touched, so the 4x-smaller host transfer normalizes
    # once and every consumer below (VGG target, D_img real branch, D_obj
    # crops, L1 target) sees the reference's float convention.
    imgs = wire_to_float(jnp.asarray(batch.imgs))
    objs = jnp.asarray(batch.objs)
    boxes = jnp.asarray(batch.boxes)
    masks = jnp.asarray(batch.masks)
    obj_mask = jnp.asarray(batch.obj_mask)
    n, o = objs.shape
    flat_w = obj_mask.reshape(n * o)
    one_hot_flat = jax.nn.one_hot(objs.reshape(n * o), mc.num_objs)

    # ------------------------------------------------------------------
    # 1. Generator update (trainer.train_generator, trainer.py:205-263).
    # ------------------------------------------------------------------
    def g_loss_fn(g_params):
        out, g_mut = mods.model.apply(
            {"params": g_params, "batch_stats": state.g_stats},
            objs, jnp.asarray(batch.triples), attributes, obj_mask,
            jnp.asarray(batch.triple_mask), mask_noise, imgs=imgs,
            boxes_gt=boxes, masks_gt=masks, train=True,
            mutable=["batch_stats"])
        terms = {}
        total = jnp.zeros((), jnp.float32)

        if lw.l1_pixel_loss_weight > 0:
            l1 = L.l1_loss(out.imgs_pred, imgs) * use_gt
            terms["L1_pixel_loss"] = l1 * lw.l1_pixel_loss_weight
        box_gate = use_gt if lw.box_loss_gated else jnp.float32(1.0)
        loss_bbox = L.mse_loss(out.boxes_pred, boxes, w=obj_mask) * box_gate
        terms["bbox_pred"] = loss_bbox * lw.bbox_pred_loss_weight

        if mods.vgg is not None:
            fx = mods.vgg.apply({"params": state.vgg_params}, out.imgs_pred)
            fy = mods.vgg.apply({"params": state.vgg_params}, imgs)
            terms["g_vgg"] = (L.vgg_perceptual_loss(fx, fy)
                              * lw.vgg_features_weight)

        # D_obj on the fake image with GT boxes (trainer.py:223).
        (scores_fake, logits_fake, _), d_obj_mut = mods.d_obj.apply(
            {"params": state.d_obj_params, "batch_stats": state.d_obj_stats},
            out.imgs_pred, boxes, obj_mask, train=True,
            mutable=["batch_stats"])
        terms["ac_loss"] = (L.masked_cross_entropy(logits_fake, objs,
                                                   w=obj_mask)
                            * lw.ac_loss_weight)
        terms["g_gan_obj_loss"] = (gan_g_loss(scores_fake, w=obj_mask)
                                   * lw.d_obj_weight)

        # D_mask on predicted masks, class-conditional (trainer.py:228-242).
        masks_pred_flat = out.masks_pred.reshape(
            n * o, mc.mask_size, mc.mask_size, 1)
        scores_fake_m = mods.d_mask.apply(
            {"params": state.d_mask_params}, masks_pred_flat, one_hot_flat)
        terms["g_gan_mask_obj_loss"] = (
            L.multiscale_gan_loss(scores_fake_m, True, use_lsgan, w=flat_w)
            * lw.d_mask_weight)
        if lw.d_mask_features_weight > 0:
            masks_flat = masks.reshape(n * o, mc.mask_size, mc.mask_size, 1)
            scores_real_m = mods.d_mask.apply(
                {"params": state.d_mask_params}, masks_flat, one_hot_flat)
            terms["g_mask_features_loss"] = (
                L.feature_matching_loss(scores_fake_m, scores_real_m, w=flat_w)
                * lw.d_mask_features_weight)

        # D_img: real probe for feature targets (no detach on layout,
        # trainer.py:246), fake with detached layout (trainer.py:249-250).
        pred_real = mods.d_img.apply(
            {"params": state.d_img_params},
            jnp.concatenate([out.layout, imgs], axis=-1))
        pred_fake = mods.d_img.apply(
            {"params": state.d_img_params},
            jnp.concatenate([jax.lax.stop_gradient(out.layout),
                             out.imgs_pred], axis=-1))
        terms["g_gan_img_loss"] = (
            L.multiscale_gan_loss(pred_fake, True, use_lsgan)
            * lw.d_img_weight)
        if lw.d_img_features_weight > 0:
            terms["g_gan_features_loss_img"] = (
                L.feature_matching_loss(pred_fake, pred_real)
                * lw.d_img_features_weight)

        for v in terms.values():
            total = total + v
        aux = (out, g_mut["batch_stats"], d_obj_mut["batch_stats"], terms)
        return total, aux

    # Optional grad-tree cast at the backward->optimizer boundary: a bf16
    # grad tree halves any HBM materialization between backward and Adam
    # (the moment math promotes back to f32 — optax semantics). Opt-in
    # byte-removal lever, A/B'd in RESULTS §37; "" = f32 reference parity.
    _gd = (jnp.dtype(cfg.train.grads_dtype)
           if cfg.train.grads_dtype else None)
    cast_grads = ((lambda g: jax.tree.map(lambda x: x.astype(_gd), g))
                  if _gd is not None else (lambda g: g))

    (g_total, (out, g_stats, d_obj_stats, g_terms)), g_grads = \
        jax.value_and_grad(g_loss_fn, has_aux=True)(state.g_params)
    g_grads = cast_grads(g_grads)
    opt_g, _, _, _ = mods.optimizers()
    g_updates, opt_g_state = opt_g.update(g_grads, state.opt_g, state.g_params)
    g_params = optax.apply_updates(state.g_params, g_updates)
    metrics.update(g_terms)
    metrics["total_loss"] = g_total

    # Everything from the G forward is a constant now (= .detach()).
    imgs_pred_d = jax.lax.stop_gradient(out.imgs_pred)
    masks_pred_d = jax.lax.stop_gradient(out.masks_pred)
    layout_d = jax.lax.stop_gradient(out.layout)
    obj_repr_d = jax.lax.stop_gradient(out.obj_repr)

    # ------------------------------------------------------------------
    # 2. Appearance pool -> wrong-texture layout (model.py:164-172).
    # ------------------------------------------------------------------
    wrong_rep, pool = pool_query(state.pool, r_pool,
                                 objs.reshape(n * o),
                                 obj_repr_d.reshape(n * o, mc.rep_size),
                                 flat_w)
    # Class part of the layout vectors: one-hot, or the model's learned
    # class embedding when layout_embed_dim is set (already a constant
    # w.r.t. the D updates after stop_gradient).
    cls_vecs_d = jax.lax.stop_gradient(out.cls_vecs)
    wrong_vecs = jnp.concatenate(
        [cls_vecs_d, wrong_rep.reshape(n, o, mc.rep_size)], axis=-1)
    layout_wrong = masks_to_layout(wrong_vecs, boxes, masks, obj_mask, h, w,
                                   backend="xla")

    # ------------------------------------------------------------------
    # 3. D_mask update (trainer.py:281-300).
    # ------------------------------------------------------------------
    def d_mask_loss_fn(params):
        masks_pred_flat = masks_pred_d.reshape(
            n * o, mc.mask_size, mc.mask_size, 1)
        masks_flat = masks.reshape(n * o, mc.mask_size, mc.mask_size, 1)
        sf = mods.d_mask.apply({"params": params}, masks_pred_flat,
                               one_hot_flat)
        sr = mods.d_mask.apply({"params": params}, masks_flat, one_hot_flat)
        fake = L.multiscale_gan_loss(sf, False, use_lsgan, w=flat_w) * 0.5
        real = L.multiscale_gan_loss(sr, True, use_lsgan, w=flat_w) * 0.5
        return fake + real, {"fake_loss": fake, "real_loss": real}

    (_, d_mask_terms), d_mask_grads = jax.value_and_grad(
        d_mask_loss_fn, has_aux=True)(state.d_mask_params)
    d_mask_grads = cast_grads(d_mask_grads)
    _, _, _, opt_d_mask = mods.optimizers()
    dm_updates, opt_d_mask_state = opt_d_mask.update(
        d_mask_grads, state.opt_d_mask, state.d_mask_params)
    d_mask_params = optax.apply_updates(state.d_mask_params, dm_updates)
    metrics.update(d_mask_terms)

    # ------------------------------------------------------------------
    # 4. D_obj update (trainer.py:265-279). Fake branch gets GT boxes
    #    (train.py:210 quirk). Fake pass precedes real (BN stat order).
    # ------------------------------------------------------------------
    def d_obj_loss_fn(params):
        (sf, lf, _), mut = mods.d_obj.apply(
            {"params": params, "batch_stats": d_obj_stats},
            imgs_pred_d, boxes, obj_mask, train=True,
            mutable=["batch_stats"])
        (sr, lr, _), mut = mods.d_obj.apply(
            {"params": params, "batch_stats": mut["batch_stats"]},
            imgs, boxes, obj_mask, train=True, mutable=["batch_stats"])
        gan = gan_d_loss(sr, sf, w=obj_mask) * 0.5
        ac_real = L.masked_cross_entropy(lr, objs, w=obj_mask)
        ac_fake = L.masked_cross_entropy(lf, objs, w=obj_mask)
        terms = {"d_obj_gan_loss": gan, "d_ac_loss_real": ac_real,
                 "d_ac_loss_fake": ac_fake}
        return gan + ac_real + ac_fake, (terms, mut["batch_stats"])

    (_, (d_obj_terms, d_obj_stats)), d_obj_grads = jax.value_and_grad(
        d_obj_loss_fn, has_aux=True)(state.d_obj_params)
    d_obj_grads = cast_grads(d_obj_grads)
    _, _, opt_d_obj, _ = mods.optimizers()
    do_updates, opt_d_obj_state = opt_d_obj.update(
        d_obj_grads, state.opt_d_obj, state.d_obj_params)
    d_obj_params = optax.apply_updates(state.d_obj_params, do_updates)
    metrics.update(d_obj_terms)

    # ------------------------------------------------------------------
    # 5. D_img update (trainer.py:302-325).
    # ------------------------------------------------------------------
    def d_img_loss_fn(params):
        alpha = 0.25
        fake = mods.d_img.apply(
            {"params": params},
            jnp.concatenate([layout_d, imgs_pred_d], axis=-1))
        wrong = mods.d_img.apply(
            {"params": params},
            jnp.concatenate([layout_wrong, imgs], axis=-1))
        real = mods.d_img.apply(
            {"params": params},
            jnp.concatenate([layout_d, imgs], axis=-1))
        terms = {
            "fake_image_loss":
                L.multiscale_gan_loss(fake, False, use_lsgan) * alpha,
            "wrong_texture_loss":
                L.multiscale_gan_loss(wrong, False, use_lsgan) * alpha,
            "d_img_gan_real_loss":
                L.multiscale_gan_loss(real, True, use_lsgan) * 0.5,
        }
        return sum(terms.values()), terms

    (_, d_img_terms), d_img_grads = jax.value_and_grad(
        d_img_loss_fn, has_aux=True)(state.d_img_params)
    d_img_grads = cast_grads(d_img_grads)
    _, opt_d_img, _, _ = mods.optimizers()
    di_updates, opt_d_img_state = opt_d_img.update(
        d_img_grads, state.opt_d_img, state.d_img_params)
    d_img_params = optax.apply_updates(state.d_img_params, di_updates)
    metrics.update(d_img_terms)

    new_state = state.replace(
        step=state.step + 1, rng=rng,
        g_params=g_params, g_stats=g_stats, opt_g=opt_g_state,
        d_img_params=d_img_params, opt_d_img=opt_d_img_state,
        d_obj_params=d_obj_params, d_obj_stats=d_obj_stats,
        opt_d_obj=opt_d_obj_state,
        d_mask_params=d_mask_params, opt_d_mask=opt_d_mask_state,
        pool=pool)
    metrics["use_gt"] = use_gt
    # Underscore-prefixed entries are image tensors for periodic TensorBoard
    # grids (reference write_images, trainer.py:370-392) — loggers must
    # skip them when scalarizing. Device->host transfer only happens if the
    # host actually fetches them.
    metrics["_imgs_pred"] = imgs_pred_d
    cls_nc = mc.layout_embed_dim or mc.num_objs
    metrics["_layout_one_hot"] = layout_d[..., :cls_nc]
    metrics["_layout_pred_one_hot"] = jax.lax.stop_gradient(
        out.layout_pred)[..., :cls_nc]
    return new_state, metrics
