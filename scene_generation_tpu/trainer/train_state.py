"""Train state: all parameters, optimizer states, BN stats, the appearance
pool, and the PRNG key — one pytree, so the whole step jits/shards/donates.

Mirrors the reference checkpoint schema (train.py:132-162): generator + 3
discriminators + 4 Adam optimizers (G/D_obj/D_img lr 1e-4, D_mask lr 1e-5,
betas (0.5, 0.999); trainer.py:60,80,106,133).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from scene_generation_tpu.config import Config
from scene_generation_tpu.data.batching import Batch
from scene_generation_tpu.models.discriminators import (
    AcCropDiscriminator, MultiscaleDiscriminator, MultiscaleMaskDiscriminator)
from scene_generation_tpu.models.model import SceneModel
from scene_generation_tpu.models.vgg import Vgg19Features, load_torch_vgg19
from scene_generation_tpu.ops.images import wire_to_float
from scene_generation_tpu.trainer.optim import adam_storage
from scene_generation_tpu.trainer.pools import VectorPoolState, create_pool


class Modules:
    """Static module bundle (hashable closure constants for the jitted step)."""

    def __init__(self, cfg: Config):
        mc, dc = cfg.model, cfg.discriminator
        self.cfg = cfg
        ddtype = dc.jax_compute_dtype
        self.model = SceneModel(mc)
        self.d_img = MultiscaleDiscriminator(
            ndf=dc.ndf, n_layers=dc.n_layers_d, norm=dc.norm_d,
            use_sigmoid=dc.no_lsgan, num_d=dc.num_d, dtype=ddtype)
        self.d_obj = AcCropDiscriminator(
            num_objects=mc.num_objs, object_size=dc.crop_size,
            arch=dc.d_obj_arch, normalization=dc.d_normalization,
            activation=dc.d_activation, padding=dc.d_padding, dtype=ddtype)
        self.d_mask = MultiscaleMaskDiscriminator(
            ndf=dc.ndf_mask, n_layers=dc.n_layers_d_mask, norm=dc.norm_d_mask,
            use_sigmoid=dc.no_lsgan, num_d=dc.num_d_mask, dtype=ddtype)
        self.vgg = (Vgg19Features(dtype=ddtype)
                    if cfg.loss.vgg_features_weight > 0 else None)

    def optimizers(self) -> Tuple[optax.GradientTransformation, ...]:
        t = self.cfg.train
        # Moment STORAGE dtypes (math stays f32). Defaults are f32
        # (reference parity, trainer.py Adam betas (0.5, 0.999)); bf16 mu
        # is a measured HBM-byte-removal lever (RESULTS §30 roofline: the
        # step is bandwidth-bound). nu precision constraints are derived
        # and proven in trainer/optim.py + tests/test_optim.py (bf16 nu
        # FREEZES at b2=0.999; f16 accumulates but can underflow).
        mu = jnp.dtype(t.adam_mu_dtype) if t.adam_mu_dtype else None
        nu = jnp.dtype(t.adam_nu_dtype) if t.adam_nu_dtype else None
        if nu is None:
            # optax.adam: bit-identical here and maximally legible.
            adam = lambda lr: optax.adam(lr, b1=t.beta1, b2=t.beta2,
                                         mu_dtype=mu)
        else:
            adam = lambda lr: adam_storage(lr, b1=t.beta1, b2=t.beta2,
                                           mu_dtype=mu, nu_dtype=nu)
        return (adam(t.learning_rate), adam(t.learning_rate),
                adam(t.learning_rate), adam(t.mask_learning_rate))


@struct.dataclass
class TrainState:
    step: jax.Array
    rng: jax.Array
    # Generator (reference Model; one optimizer over all of it, trainer.py:60).
    g_params: Any
    g_stats: Any
    opt_g: Any
    # Image discriminator.
    d_img_params: Any
    opt_d_img: Any
    # Object discriminator (has BN stats).
    d_obj_params: Any
    d_obj_stats: Any
    opt_d_obj: Any
    # Mask discriminator.
    d_mask_params: Any
    opt_d_mask: Any
    # Appearance replay pool (reference VectorPool, utils.py:62-90).
    pool: VectorPoolState
    # Frozen perceptual-loss features (torchvision VGG19 when available).
    vgg_params: Any


def create_train_state(cfg: Config, rng: jax.Array, batch: Batch,
                       load_vgg: bool = True) -> Tuple[Modules, TrainState]:
    """Initialize all modules against a real batch's shapes."""
    mods = Modules(cfg)
    mc = cfg.model
    n, o = batch.objs.shape
    h, w = mc.image_size

    r_model, r_dimg, r_dobj, r_dmask, r_vgg, r_state = jax.random.split(rng, 6)
    noise = jnp.zeros((mc.mask_noise_dim,), jnp.float32)

    # All inits are jitted with inputs as ARGUMENTS: eager init is thousands
    # of tiny dispatches (minutes over a remote tunnel), and closure-captured
    # constants would trigger compile-time constant folding of the forward.
    def g_init(key, objs, triples, attrs, om, tm, noise, imgs, boxes, masks):
        return mods.model.init(key, objs, triples, attrs, om, tm, noise,
                               imgs=imgs, boxes_gt=boxes, masks_gt=masks)

    g_vars = jax.jit(g_init)(
        r_model, jnp.asarray(batch.objs), jnp.asarray(batch.triples),
        jnp.asarray(batch.attributes), jnp.asarray(batch.obj_mask),
        jnp.asarray(batch.triple_mask), noise, jnp.asarray(batch.imgs),
        jnp.asarray(batch.boxes), jnp.asarray(batch.masks))

    layout_nc = mc.layout_nc
    d_img_vars = jax.jit(mods.d_img.init)(
        r_dimg, jnp.zeros((n, h, w, layout_nc + mc.output_nc)))
    d_obj_vars = jax.jit(mods.d_obj.init)(
        r_dobj, wire_to_float(jnp.asarray(batch.imgs)),
        jnp.asarray(batch.boxes), jnp.asarray(batch.obj_mask))
    d_mask_vars = jax.jit(mods.d_mask.init)(
        r_dmask, jnp.zeros((n * o, mc.mask_size, mc.mask_size, 1)),
        jnp.zeros((n * o, mc.num_objs)))

    vgg_params = None
    if mods.vgg is not None:
        vgg_params = jax.jit(mods.vgg.init)(
            r_vgg, jnp.zeros((1, h, w, 3)))["params"]
        if load_vgg:
            vgg_params, loaded = load_torch_vgg19(dict(vgg_params))
            if not loaded:
                print("[scene_generation_tpu] WARNING: no torchvision VGG19 "
                      "checkpoint found; perceptual loss uses random "
                      "projection features (set SGT_VGG19_WEIGHTS).")

    opt_g, opt_d_img, opt_d_obj, opt_d_mask = mods.optimizers()
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        rng=r_state,
        g_params=g_vars["params"],
        g_stats=g_vars.get("batch_stats", FrozenDict()),
        opt_g=opt_g.init(g_vars["params"]),
        d_img_params=d_img_vars["params"],
        opt_d_img=opt_d_img.init(d_img_vars["params"]),
        d_obj_params=d_obj_vars["params"],
        d_obj_stats=d_obj_vars.get("batch_stats", FrozenDict()),
        opt_d_obj=opt_d_obj.init(d_obj_vars["params"]),
        d_mask_params=d_mask_vars["params"],
        opt_d_mask=opt_d_mask.init(d_mask_vars["params"]),
        pool=create_pool(mc.num_objs, mc.pool_size, mc.rep_size),
        vgg_params=vgg_params,
    )
    return mods, state
