"""Pallas TPU kernel: fused differentiable ROI crop.

The XLA path (ops/crop.py) lowers to two batched einsums with an
(N, O, HH, W, C) intermediate in HBM, and re-reads each image O times (once
per object slot). Here each image is loaded into VMEM ONCE (as a
channel-major (C*H, W) tile) and all O crops are produced from it with
plain 2D MXU matmuls:

    crop[o, c] = ry[o] (HH, H)  @  img_c (H, W)  @  rx[o]^T (W, WW)

Mosaic's ``tpu.matmul`` supports only single contracting dims, so the
channel axis is handled by static slicing of the channel-major tile and a
python loop over C (C=3); the NHWC<->channel-major transposes happen in
XLA outside the kernel.

Backward (custom VJP; pallas_call has no automatic one), given
u = dL/dcrop as channel-major (N, O, C*HH, WW):

    t1_c    = ry[o] @ img_c                  (HH, W)     recomputed in VMEM
    t2_c    = img_c @ rx[o]^T                (H, WW)
    d_rx[o]+= u_oc^T @ t1_c                  (WW, W)
    d_ry[o]+= u_oc   @ t2_c^T                (HH, H)
    d_img_c+= ry[o]^T @ (u_oc @ rx[o])       (H, W), accumulated over o

— all 2D MXU contractions; gradients w.r.t. boxes flow through the
jax-level (autodiff'd) hat-matrix construction of ry/rx in the caller
(ops/crop.py), exactly like the layout compositor.

Reference semantics matched: ``crop_bbox_batch`` (bilinear.py:26-130),
bilinear, align_corners-style, zeros outside the image.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def crop_pallas(interpret: bool, imgs, ry, rx):
    """Fused crop. imgs (N, H, W, C); ry (N, O, HH, H); rx (N, O, WW, W)
    -> (N, O, HH, WW, C)."""
    return _crop_fwd_host(imgs, ry, rx, interpret)


def _crop_fwd(interpret, imgs, ry, rx):
    return _crop_fwd_host(imgs, ry, rx, interpret), (imgs, ry, rx)


def _crop_bwd(interpret, res, u):
    imgs, ry, rx = res
    return _crop_bwd_host(imgs, ry, rx, u, interpret)


crop_pallas.defvjp(_crop_fwd, _crop_bwd)


def _to_cmajor(imgs):
    """(N, H, W, C) -> (N, C*H, W)."""
    n, h, w, c = imgs.shape
    return imgs.transpose(0, 3, 1, 2).reshape(n, c * h, w)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _crop_fwd_host(imgs, ry, rx, interpret=False):
    n, h, w, c = imgs.shape
    o, hh = ry.shape[1], ry.shape[2]
    ww = rx.shape[2]
    out = _crop_fwd_kernel(_to_cmajor(imgs), ry, rx, h, c, interpret)
    # (N, O, C*HH, WW) -> (N, O, HH, WW, C)
    return out.reshape(n, o, c, hh, ww).transpose(0, 1, 3, 4, 2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _crop_bwd_host(imgs, ry, rx, u, interpret=False):
    n, h, w, c = imgs.shape
    # u: (N, O, HH, WW, C) -> channel-major (N, O, C*HH, WW)
    n_, o, hh, ww, c_ = u.shape
    u2 = u.transpose(0, 1, 4, 2, 3).reshape(n, o, c * hh, ww)
    dimg2, dry, drx = _crop_bwd_kernel(_to_cmajor(imgs), ry, rx, u2, h, c,
                                       interpret)
    dimg = dimg2.reshape(n, c, h, w).transpose(0, 2, 3, 1)
    return dimg, dry, drx


@functools.partial(jax.jit, static_argnames=("h", "c", "interpret"))
def _crop_fwd_kernel(imgs2, ry, rx, h, c, interpret=False):
    from jax.experimental import pallas as pl

    n = imgs2.shape[0]
    o, hh = ry.shape[1], ry.shape[2]
    ww = rx.shape[2]
    w = imgs2.shape[2]
    f32 = jnp.float32

    def kernel(imgs_ref, ry_ref, rx_ref, out_ref):
        img = imgs_ref[...].astype(f32)               # (C*H, W)
        for k in range(o):
            ry_k = ry_ref[k].astype(f32)              # (HH, H)
            rxt_k = rx_ref[k].astype(f32).T           # (W, WW)
            parts = []
            for ci in range(c):
                img_c = img[ci * h:(ci + 1) * h, :]   # (H, W)
                t = jnp.dot(ry_k, img_c, preferred_element_type=f32)
                parts.append(jnp.dot(t, rxt_k, preferred_element_type=f32))
            out_ref[k] = jnp.concatenate(parts, axis=0).astype(
                out_ref.dtype)                        # (C*HH, WW)

    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((None, c * h, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, o, hh, h), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((None, o, ww, w), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, o, c * hh, ww),
                               lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, o, c * hh, ww), imgs2.dtype),
        interpret=interpret,
    )(imgs2, ry, rx)


@functools.partial(jax.jit, static_argnames=("h", "c", "interpret"))
def _crop_bwd_kernel(imgs2, ry, rx, u2, h, c, interpret=False):
    from jax.experimental import pallas as pl

    n = imgs2.shape[0]
    o, hh = ry.shape[1], ry.shape[2]
    ww = rx.shape[2]
    w = imgs2.shape[2]
    f32 = jnp.float32

    def kernel(imgs_ref, ry_ref, rx_ref, u_ref, dimg_ref, dry_ref, drx_ref):
        img = imgs_ref[...].astype(f32)               # (C*H, W)
        dimg = [jnp.zeros((h, w), f32) for _ in range(c)]
        for k in range(o):
            ry_k = ry_ref[k].astype(f32)              # (HH, H)
            rx_k = rx_ref[k].astype(f32)              # (WW, W)
            u_k = u_ref[k].astype(f32)                # (C*HH, WW)
            dry_k = jnp.zeros((hh, h), f32)
            drx_k = jnp.zeros((ww, w), f32)
            for ci in range(c):
                img_c = img[ci * h:(ci + 1) * h, :]   # (H, W)
                u_kc = u_k[ci * hh:(ci + 1) * hh, :]  # (HH, WW)
                t1 = jnp.dot(ry_k, img_c, preferred_element_type=f32)
                t2 = jnp.dot(img_c, rx_k.T, preferred_element_type=f32)
                drx_k += jnp.dot(u_kc.T, t1, preferred_element_type=f32)
                dry_k += jnp.dot(u_kc, t2.T, preferred_element_type=f32)
                ub = jnp.dot(u_kc, rx_k, preferred_element_type=f32)
                dimg[ci] += jnp.dot(ry_k.T, ub, preferred_element_type=f32)
            dry_ref[k] = dry_k.astype(dry_ref.dtype)
            drx_ref[k] = drx_k.astype(drx_ref.dtype)
        dimg_ref[...] = jnp.concatenate(dimg, axis=0).astype(dimg_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((None, c * h, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, o, hh, h), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((None, o, ww, w), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((None, o, c * hh, ww), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((None, c * h, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((None, o, hh, h), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((None, o, ww, w), lambda i: (i, 0, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, c * h, w), imgs2.dtype),
            jax.ShapeDtypeStruct((n, o, hh, h), ry.dtype),
            jax.ShapeDtypeStruct((n, o, ww, w), rx.dtype),
        ),
        interpret=interpret,
    )(imgs2, ry, rx, u2)
