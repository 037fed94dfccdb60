"""Pallas TPU kernel: fused layout compositor.

Fuses, in one VMEM-resident pass per (image, row-tile):
  mask resample (two small matmuls per object on the MXU)
  -> [test mode] occlusion claims (first-claim per pixel over the
     mass-sorted object order, reference layout.py:157-169)
  -> per-object vector contraction into the (TH, W, D) layout tile.

The XLA path (ops/layout.py) materializes the (N, O, H, W) sampled-mask
tensor in HBM and reads it back for the contraction; here it never leaves
VMEM. The object axis O is small and static (MAX_OBJS), so the kernel loops
over it unrolled — each iteration is MXU matmuls + VPU elementwise on
(TH, W) tiles.

Caller contract (see ops/layout.py):
  * invalid object slots are pre-zeroed in ``masks`` (and ``vecs``);
  * for test mode, all per-object inputs are pre-sorted by ascending
    sampled mass (smaller objects claim pixels first and win overlaps) —
    the (N, O) argsort is tiny and stays in XLA.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def pallas_available() -> bool:
    try:
        from jax.experimental import pallas  # noqa: F401
        return True
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# Differentiable train-path compositor: forward AND backward as Pallas
# kernels via jax.custom_vjp (pallas_call has no automatic VJP).
#
#   layout = sum_o (ry_o @ M_o @ rx_o^T) (x) v_o
#
# Backward, given g = dL/dlayout (N, H, W, D):
#   u_o    = g . v_o                          (N, O, H, W)  [never in HBM]
#   d_v_o  = <s_o, g>                          s_o recomputed per tile
#   d_ry_o = u_o @ (M_o @ rx_o^T)^T
#   d_rx_o = u_o^T @ (ry_o @ M_o)
#   d_M_o  = ry_o^T @ u_o @ rx_o
# — all MXU matmuls; gradients w.r.t. boxes flow through the (jax-level,
# autodiff'd) hat-matrix construction of ry/rx in the caller.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def compose_train(interpret: bool, tile_h: int, vecs, ry, rx, masks):
    return _compose_train_fwd_kernel(vecs, ry, rx, masks, interpret, tile_h)


def _compose_train_fwd(interpret, tile_h, vecs, ry, rx, masks):
    out = _compose_train_fwd_kernel(vecs, ry, rx, masks, interpret, tile_h)
    return out, (vecs, ry, rx, masks)


def _compose_train_bwd(interpret, tile_h, res, g):
    vecs, ry, rx, masks = res
    return _compose_train_bwd_kernel(vecs, ry, rx, masks, g, interpret,
                                     tile_h)


compose_train.defvjp(_compose_train_fwd, _compose_train_bwd)


@functools.partial(jax.jit, static_argnames=("interpret", "tile_h"))
def _compose_train_fwd_kernel(vecs, ry, rx, masks, interpret=False,
                              tile_h=16):
    return masks_to_layout_pallas(vecs, ry, rx, masks, test_mode=False,
                                  interpret=interpret, tile_h=tile_h)


@functools.partial(jax.jit, static_argnames=("interpret", "tile_h"))
def _compose_train_bwd_kernel(vecs, ry, rx, masks, g, interpret=False,
                              tile_h=16):
    from jax.experimental import pallas as pl

    n, o, d = vecs.shape
    m = masks.shape[-1]
    h = ry.shape[2]
    w = rx.shape[2]
    if h % tile_h:
        tile_h = h
    f32 = jnp.float32

    def kernel(vecs_ref, ry_ref, rx_ref, masks_ref, g_ref,
               dv_ref, dry_ref, drx_ref, dm_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            dv_ref[...] = jnp.zeros_like(dv_ref)
            drx_ref[...] = jnp.zeros_like(drx_ref)
            dm_ref[...] = jnp.zeros_like(dm_ref)

        g_flat = g_ref[...].astype(f32).reshape(tile_h * w, d)
        for k in range(o):
            ry_k = ry_ref[k].astype(f32)          # (TH, M)
            rx_k = rx_ref[k].astype(f32)          # (W, M)
            m_k = masks_ref[k].astype(f32)        # (M, M)
            v_k = vecs_ref[k].astype(f32)         # (D,)

            t2 = jnp.dot(ry_k, m_k, preferred_element_type=f32)   # (TH, M)
            s_k = jnp.dot(t2, rx_k.T, preferred_element_type=f32)  # (TH, W)
            # d_v: <s, g> over pixels.
            dv = jnp.dot(s_k.reshape(1, tile_h * w), g_flat,
                         preferred_element_type=f32)               # (1, D)
            dv_ref[k, :] += dv[0].astype(dv_ref.dtype)
            # u = g . v
            u = jnp.dot(g_flat, v_k.reshape(d, 1),
                        preferred_element_type=f32).reshape(tile_h, w)
            # d_ry (tile-local): u @ (M rx^T)^T = u @ rx M^T
            t1 = jnp.dot(m_k, rx_k.T, preferred_element_type=f32)  # (M, W)
            dry_ref[k] = jnp.dot(u, t1.T,
                                 preferred_element_type=f32).astype(
                                     dry_ref.dtype)                # (TH, M)
            # d_rx += u^T @ (ry M)
            drx_ref[k] += jnp.dot(u.T, t2,
                                  preferred_element_type=f32).astype(
                                      drx_ref.dtype)               # (W, M)
            # d_M += ry^T @ u @ rx
            dm_ref[k] += jnp.dot(jnp.dot(ry_k.T, u,
                                         preferred_element_type=f32),
                                 rx_k,
                                 preferred_element_type=f32).astype(
                                     dm_ref.dtype)                 # (M, M)

    grid = (n, h // tile_h)
    dv, dry, drx, dm = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, o, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, o, tile_h, m), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((None, o, w, m), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((None, o, m, m), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((None, tile_h, w, d), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((None, o, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, o, tile_h, m), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((None, o, w, m), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((None, o, m, m), lambda i, j: (i, 0, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, o, d), vecs.dtype),
            jax.ShapeDtypeStruct((n, o, h, m), ry.dtype),
            jax.ShapeDtypeStruct((n, o, w, m), rx.dtype),
            jax.ShapeDtypeStruct((n, o, m, m), masks.dtype),
        ),
        interpret=interpret,
    )(vecs, ry, rx, masks, g)
    return dv, dry, drx, dm


@functools.partial(jax.jit, static_argnames=("test_mode", "interpret",
                                             "tile_h"))
def masks_to_layout_pallas(vecs: jax.Array, ry: jax.Array, rx: jax.Array,
                           masks: jax.Array, test_mode: bool = False,
                           interpret: bool = False,
                           tile_h: int = 16) -> jax.Array:
    """Fused compositor.

    Args:
      vecs: (N, O, D) layout vectors.
      ry: (N, O, H, M) row interpolation matrices.
      rx: (N, O, W, M) column interpolation matrices.
      masks: (N, O, M, M) soft masks (invalid slots zeroed).
      test_mode: occlusion-ordered first-claim compositing instead of sum.

    Returns:
      (N, H, W, D) layout.
    """
    from jax.experimental import pallas as pl

    n, o, d = vecs.shape
    m = masks.shape[-1]
    h = ry.shape[2]
    w = rx.shape[2]
    if h % tile_h:
        tile_h = h
    dtype = vecs.dtype

    def kernel(vecs_ref, ry_ref, rx_ref, masks_ref, out_ref):
        acc = jnp.zeros((tile_h, w, d), jnp.float32)
        taken = jnp.zeros((tile_h, w), jnp.float32)
        for k in range(o):
            # Resample object k's mask for this row tile: two MXU matmuls.
            tmp = jnp.dot(ry_ref[k], masks_ref[k],
                          preferred_element_type=jnp.float32)     # (TH, M)
            sampled = jnp.dot(tmp, rx_ref[k].T,
                              preferred_element_type=jnp.float32)  # (TH, W)
            if test_mode:
                binm = (sampled > 0.5).astype(jnp.float32)
                claim = binm * (1.0 - taken)
                taken = jnp.minimum(taken + claim, 1.0)
                weight = sampled * claim
            else:
                weight = sampled
            # Outer-product accumulate: (TH, W) x (D,) -> (TH, W, D).
            vk = vecs_ref[k].astype(jnp.float32)
            acc = acc + weight[:, :, None] * vk[None, None, :]
        out_ref[...] = acc.astype(out_ref.dtype)

    grid = (n, h // tile_h)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, o, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, o, tile_h, m), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((None, o, w, m), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((None, o, m, m), lambda i, j: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, tile_h, w, d),
                               lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, d), dtype),
        interpret=interpret,
    )(vecs, ry, rx, masks.astype(dtype))
