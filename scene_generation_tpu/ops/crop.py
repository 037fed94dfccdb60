"""Differentiable ROI cropping for the object discriminator / appearance
encoder.

TPU-native replacement of reference ``crop_bbox_batch`` (``bilinear.py:26-98``)
whose per-image Python loop + inverse-permutation reassembly disappear under
the padded (N, O) contract: a single vmap'd pair of interpolation matmuls
(see ops/sampling.py) crops every object slot of every image at once.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from scene_generation_tpu.ops.sampling import crop_matrices, interp_matrix


def crop_bbox_batch(imgs: jax.Array, boxes: jax.Array, hh: int,
                    ww: Optional[int] = None, backend: str = "auto",
                    interpret: bool = False) -> jax.Array:
    """Crop every object box from its image.

    Args:
      imgs: (N, H, W, C) images.
      boxes: (N, O, 4) [x0, y0, x1, y1] in [0, 1] image coordinates.
      hh, ww: output crop resolution.
      backend: 'auto' (default) | 'xla' | 'pallas'. 'pallas' is the fused
        custom-VJP kernel (each image is read into VMEM once for all O
        crops; the XLA path re-reads it per object and round-trips an
        (N, O, HH, W, C) intermediate through HBM); 'auto' resolves to
        pallas on TPU. Hardware-validated on 1x v5e
        (scripts/validate_pallas_crop.py): fwd+grad parity at 32/64px
        production shapes; fwd 1.27 ms vs 1.85 xla at 32px, equal at 64px.
      interpret: run the Pallas kernel in interpret mode (CPU testing).

    Returns:
      (N, O, HH, WW, C) crops. Semantics match reference
      ``crop_bbox(backend='cudnn')`` (bilinear.py:101-130): bilinear,
      align_corners-style, zeros outside the image.
    """
    if ww is None:
        ww = hh
    _, h, w, _ = imgs.shape
    dtype = imgs.dtype
    ry, rx = crop_matrices(boxes.astype(dtype), hh, ww, h, w)
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        from scene_generation_tpu.ops.pallas.crop import crop_pallas
        # Gradients w.r.t. boxes flow through the jax-level crop_matrices.
        return crop_pallas(interpret, imgs, ry, rx)
    # crop[n,o,p,q,c] = sum_{y,x} ry[n,o,p,y] img[n,y,x,c] rx[n,o,q,x]
    tmp = jnp.einsum("nopy,nyxc->nopxc", ry, imgs,
                     preferred_element_type=dtype)
    return jnp.einsum("nopxc,noqx->nopqc", tmp, rx,
                      preferred_element_type=dtype)


def uncrop_bbox(feats: jax.Array, boxes: jax.Array, h: int,
                w: Optional[int] = None) -> jax.Array:
    """Place (N, O, HH, WW, C) feature crops back into (N, O, H, W, C) frames.

    Inverse of crop_bbox_batch; reference ``uncrop_bbox``
    (``bilinear.py:133-185``). Pixels outside the box are zero. Note the
    reference treats boxes here as [x0, y0, w, h] (bilinear.py:156); we keep
    the uniform [x0, y0, x1, y1] convention used everywhere else.
    """
    if w is None:
        w = h
    hh, ww = feats.shape[-3], feats.shape[-2]
    dtype = feats.dtype
    x0, y0, x1, y1 = (boxes[..., i].astype(dtype) for i in range(4))
    eps = jnp.asarray(1e-6, dtype)
    bw = jnp.where(jnp.abs(x1 - x0) < eps, eps, x1 - x0)
    bh = jnp.where(jnp.abs(y1 - y0) < eps, eps, y1 - y0)

    xs = jnp.linspace(0.0, 1.0, w, dtype=dtype)
    ys = jnp.linspace(0.0, 1.0, h, dtype=dtype)
    px = (xs - x0[..., None]) / bw[..., None] * (ww - 1)   # (N,O,W)
    py = (ys - y0[..., None]) / bh[..., None] * (hh - 1)   # (N,O,H)
    ry = interp_matrix(py, hh)                             # (N,O,H,HH)
    rx = interp_matrix(px, ww)                             # (N,O,W,WW)
    tmp = jnp.einsum("nohp,nopqc->nohqc", ry, feats,
                     preferred_element_type=dtype)
    return jnp.einsum("nohqc,nowq->nohwc", tmp, rx,
                      preferred_element_type=dtype)
