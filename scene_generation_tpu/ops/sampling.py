"""Bilinear sampling as dense MXU matmuls.

The reference implements its two bespoke spatial ops — layout composition
(``layout.py:64-93``) and differentiable ROI cropping (``bilinear.py:26-130``)
— on top of cuDNN ``F.grid_sample`` (PyTorch 1.0 semantics: bilinear,
``align_corners=True``-style coordinates, zero padding outside the input).

TPU-native formulation: ``grid_sample`` is *linear* in its input, and the
grids used here are axis-separable (every row shares its y-coordinate, every
column its x-coordinate — see ``layout.py:96-128`` and
``bilinear.py:124-125``). Therefore each resample factorizes into two small
dense 1-D interpolation matrices:

    sampled = R_y @ input @ R_x^T

where ``R[p, m] = max(0, 1 - |coord(p) - m|)`` is the bilinear hat weight of
input grid line ``m`` at output sample coordinate ``coord(p)``. Out-of-range
samples get all-zero rows, which reproduces grid_sample's zero padding
exactly (including the blurred half-pixel box edges the reference relies on,
``layout.py:53-57``). Everything becomes batched dense matmuls that XLA maps
straight onto the MXU — no gathers, and the backward pass is matmul
transposes (no scatter).

``bilinear_sample_gather`` is a pure-gather oracle with identical semantics,
kept for correctness tests (cf. the reference's own pure-gather backend,
``bilinear.py:188-243``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def interp_matrix(coords: jax.Array, in_size: int) -> jax.Array:
    """Bilinear interpolation matrix for 1-D sample coordinates.

    Args:
      coords: (..., P) sample positions in *input pixel* space, where valid
        input grid lines live at 0 .. in_size-1.
      in_size: number of input grid lines M.

    Returns:
      (..., P, M) weights; rows for out-of-range coords sum to < 1 (zero
      padding), matching torch grid_sample(padding_mode='zeros').
    """
    m = jnp.arange(in_size, dtype=coords.dtype)
    diff = jnp.abs(coords[..., None] - m)
    return jnp.maximum(0.0, 1.0 - diff)


def box_sample_matrices(boxes: jax.Array, out_h: int, out_w: int,
                        in_size: int):
    """Interpolation matrices realizing the reference layout grid.

    Reproduces ``_boxes_to_grid`` + ``grid_sample`` (layout.py:96-128): output
    pixel (h, w) lies at normalized image coords (w/(W-1), h/(H-1)); its
    sample location inside the object's M x M mask is
    ``(coord - box_min) / box_extent * (M - 1)``.

    Args:
      boxes: (..., 4) [x0, y0, x1, y1] in [0, 1] image coordinates.
      out_h, out_w: output (image) size H, W.
      in_size: mask resolution M.

    Returns:
      (ry, rx): (..., H, M) and (..., W, M) interpolation matrices such that
      ``sampled = ry @ mask @ rx^T``.
    """
    dtype = boxes.dtype
    x0, y0, x1, y1 = (boxes[..., i] for i in range(4))
    ww = x1 - x0
    hh = y1 - y0
    # Guard degenerate boxes (reference divides by zero, layout.py:117-118;
    # we clamp the extent so predicted-degenerate boxes can't emit NaNs).
    eps = jnp.asarray(1e-6, dtype)
    ww = jnp.where(jnp.abs(ww) < eps, eps, ww)
    hh = jnp.where(jnp.abs(hh) < eps, eps, hh)

    xs = jnp.linspace(0.0, 1.0, out_w, dtype=dtype)
    ys = jnp.linspace(0.0, 1.0, out_h, dtype=dtype)
    scale = in_size - 1
    px = (xs - x0[..., None]) / ww[..., None] * scale   # (..., W)
    py = (ys - y0[..., None]) / hh[..., None] * scale   # (..., H)
    return interp_matrix(py, in_size), interp_matrix(px, in_size)


def crop_matrices(boxes: jax.Array, out_h: int, out_w: int,
                  in_h: int, in_w: int):
    """Interpolation matrices realizing the reference ROI crop.

    Reproduces ``crop_bbox(backend='cudnn')`` (bilinear.py:101-130): output
    crop pixel (p, q) samples the image at
    ``x = (x0 + (x1 - x0) * q / (WW - 1)) * (W - 1)`` (align_corners-style).

    Args:
      boxes: (..., 4) [x0, y0, x1, y1] in [0, 1] image coordinates.
      out_h, out_w: crop size HH, WW.
      in_h, in_w: image size H, W.

    Returns:
      (ry, rx): (..., HH, H) and (..., WW, W) matrices such that
      ``crop = ry @ image @ rx^T`` (per channel).
    """
    dtype = boxes.dtype
    x0, y0, x1, y1 = (boxes[..., i] for i in range(4))
    tx = jnp.linspace(0.0, 1.0, out_w, dtype=dtype)
    ty = jnp.linspace(0.0, 1.0, out_h, dtype=dtype)
    px = (x0[..., None] + (x1 - x0)[..., None] * tx) * (in_w - 1)  # (..., WW)
    py = (y0[..., None] + (y1 - y0)[..., None] * ty) * (in_h - 1)  # (..., HH)
    return interp_matrix(py, in_h), interp_matrix(px, in_w)


def bilinear_sample_gather(img: jax.Array, px: jax.Array,
                           py: jax.Array) -> jax.Array:
    """Pure-gather bilinear sampling oracle (zero padding outside).

    Semantics match torch ``F.grid_sample(..., align_corners=True)`` given
    pixel-space coordinates; used as the test oracle for the matrix
    formulation (cf. reference ``bilinear.py:188-243``).

    Args:
      img: (H, W) or (H, W, C).
      px, py: (HH, WW) pixel-space sample coordinates.
    Returns:
      (HH, WW) or (HH, WW, C) samples.
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, _ = img.shape

    x0f = jnp.floor(px)
    y0f = jnp.floor(py)
    wx1 = px - x0f
    wy1 = py - y0f

    def corner(yf, xf, wgt):
        valid = (xf >= 0) & (xf <= w - 1) & (yf >= 0) & (yf <= h - 1)
        xi = jnp.clip(xf, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yf, 0, h - 1).astype(jnp.int32)
        vals = img[yi, xi]  # (HH, WW, C)
        return vals * (wgt * valid.astype(img.dtype))[..., None]

    out = (corner(y0f, x0f, (1 - wy1) * (1 - wx1))
           + corner(y0f, x0f + 1, (1 - wy1) * wx1)
           + corner(y0f + 1, x0f, wy1 * (1 - wx1))
           + corner(y0f + 1, x0f + 1, wy1 * wx1))
    return out[..., 0] if squeeze else out
