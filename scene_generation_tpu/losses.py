"""GAN / perceptual / feature-matching losses.

Reference: ``scene_generation/losses.py`` — stable BCE (:26-44), gan/wgan/
lsgan pairs (:59-132) selected by ``--gan_loss_type`` for D_obj, the
LSGAN-MSE multiscale ``GANLoss`` (:135-175) for D_img/D_mask, VGG perceptual
(:212-224), and the feature-matching L1 of ``trainer.calculate_features_loss``
(trainer.py:331-340).

All per-object variants take a validity weight vector so padded object slots
contribute nothing (the reference has no padding; masked means reduce over
real elements only).
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def _masked_mean(x: jax.Array, w: Optional[jax.Array]) -> jax.Array:
    x = x.astype(jnp.float32)  # losses accumulate in f32 (bf16 nets)
    if w is None:
        return jnp.mean(x)
    w = jnp.broadcast_to(w.reshape(w.shape + (1,) * (x.ndim - w.ndim)),
                         x.shape).astype(x.dtype)
    return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)


def bce_loss(scores: jax.Array, target: jax.Array,
             w: Optional[jax.Array] = None) -> jax.Array:
    """Numerically stable BCE-with-logits (losses.py:26-44)."""
    neg_abs = -jnp.abs(scores)
    loss = jnp.maximum(scores, 0.0) - scores * target + jnp.log1p(
        jnp.exp(neg_abs))
    return _masked_mean(loss, w)


# --- gan/wgan/lsgan pairs for D_obj (losses.py:59-132) ---

def gan_g_loss(scores_fake, w=None):
    return bce_loss(scores_fake, jnp.ones_like(scores_fake), w)


def gan_d_loss(scores_real, scores_fake, w=None):
    return (bce_loss(scores_real, jnp.ones_like(scores_real), w)
            + bce_loss(scores_fake, jnp.zeros_like(scores_fake), w))


def wgan_g_loss(scores_fake, w=None):
    return -_masked_mean(scores_fake, w)


def wgan_d_loss(scores_real, scores_fake, w=None):
    return _masked_mean(scores_fake, w) - _masked_mean(scores_real, w)


def lsgan_g_loss(scores_fake, w=None):
    s = jax.nn.sigmoid(scores_fake)
    return _masked_mean(jnp.square(s - 1.0), w)


def lsgan_d_loss(scores_real, scores_fake, w=None):
    sr = jax.nn.sigmoid(scores_real)
    sf = jax.nn.sigmoid(scores_fake)
    return (_masked_mean(jnp.square(sr - 1.0), w)
            + _masked_mean(jnp.square(sf), w))


def get_gan_losses(gan_type: str) -> Tuple[Callable, Callable]:
    """(g_loss(scores_fake), d_loss(scores_real, scores_fake));
    reference losses.py:8-23."""
    table = {
        "gan": (gan_g_loss, gan_d_loss),
        "wgan": (wgan_g_loss, wgan_d_loss),
        "lsgan": (lsgan_g_loss, lsgan_d_loss),
    }
    if gan_type not in table:
        raise ValueError(f'Unrecognized GAN type "{gan_type}"')
    return table[gan_type]


def multiscale_gan_loss(pred: List[List[jax.Array]], target_is_real: bool,
                        use_lsgan: bool = True,
                        w: Optional[jax.Array] = None) -> jax.Array:
    """Reference ``GANLoss.__call__`` (losses.py:165-175): MSE (LSGAN) of the
    final score map of each scale against a constant target, summed over
    scales. ``w`` masks the leading (object) batch axis for the mask D."""
    target = 1.0 if target_is_real else 0.0
    loss = 0.0
    for scale in pred:
        s = scale[-1]
        if use_lsgan:
            loss = loss + _masked_mean(jnp.square(s - target), w)
        else:
            sw = jnp.clip(s, 1e-7, 1 - 1e-7)
            loss = loss + _masked_mean(
                -(target * jnp.log(sw) + (1 - target) * jnp.log1p(-sw)), w)
    return loss


def feature_matching_loss(pred_fake: List[List[jax.Array]],
                          pred_real: List[List[jax.Array]],
                          w: Optional[jax.Array] = None) -> jax.Array:
    """GAN feature-matching L1 (trainer.py:331-340): all stages except the
    score map, weighted 4/len(stages) per stage and 1/num_D per scale;
    real features are stop-gradient (``.detach()``, trainer.py:339)."""
    num_d = len(pred_fake)
    feat_w = 4.0 / len(pred_fake[0])
    d_w = 1.0 / num_d
    loss = 0.0
    for i in range(num_d):
        for j in range(len(pred_fake[i]) - 1):
            diff = jnp.abs(pred_fake[i][j]
                           - jax.lax.stop_gradient(pred_real[i][j]))
            loss = loss + d_w * feat_w * _masked_mean(diff, w)
    return loss


def masked_cross_entropy(logits: jax.Array, labels: jax.Array,
                         w: Optional[jax.Array] = None) -> jax.Array:
    """AC-GAN auxiliary classification loss (discriminators.py:35)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return _masked_mean(nll, w)


def mse_loss(a: jax.Array, b: jax.Array,
             w: Optional[jax.Array] = None) -> jax.Array:
    return _masked_mean(jnp.square(a - b), w)


def l1_loss(a: jax.Array, b: jax.Array,
            w: Optional[jax.Array] = None) -> jax.Array:
    return _masked_mean(jnp.abs(a - b), w)


VGG_SLICE_WEIGHTS = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)


def vgg_perceptual_loss(feats_x: Sequence[jax.Array],
                        feats_y: Sequence[jax.Array]) -> jax.Array:
    """VGGLoss (losses.py:212-224): weighted L1 over the 5 relu_{k}_1 taps;
    the target features are stop-gradient (losses.py:223)."""
    loss = 0.0
    for wgt, fx, fy in zip(VGG_SLICE_WEIGHTS, feats_x, feats_y):
        loss = loss + wgt * jnp.mean(
            jnp.abs(fx - jax.lax.stop_gradient(fy)))
    return loss
