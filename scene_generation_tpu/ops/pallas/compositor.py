"""Pallas TPU kernel: fused occlusion-ordered layout compositor (test mode).

Fuses, in one VMEM-resident pass per (image, row-tile):
  mask resample (two small matmuls per object on the MXU)
  -> occlusion claims (first-claim per pixel over the mass-sorted object
     order, reference layout.py:157-169)
  -> per-object vector contraction into the (TH, W, D) layout tile.

The XLA path (ops/layout.py) materializes the (N, O, H, W) sampled-mask
tensor in HBM and reads it back for the contraction; here it never leaves
VMEM. The object axis O is small and static (MAX_OBJS), so the kernel loops
over it unrolled — each iteration is MXU matmuls + VPU elementwise on
(TH, W) tiles. Measured +24% end-to-end serving vs XLA (1237 vs 996 img/s
@ batch 16 bf16, forced-readback A/B 2026-08-17) — the test-mode 'auto'
default on TPU.

A differentiable custom-VJP TRAIN pair (forward + hand-written backward
kernel) previously lived here too; after honest hardware A/Bs it was
step-level indistinguishable from XLA (74.8 vs 74.6 ms) and 8x SLOWER at
the op-level backward (4.8 vs 0.6 ms, tile_h capped at 8 by the 16MB
scoped-VMEM limit), because XLA batches the per-object (M=32) matmuls into
one pipelined GEMM over N*O while a Pallas tile loop cannot. It was
removed (round 3); full numbers + analysis in RESULTS.md §10.

Caller contract (see ops/layout.py):
  * invalid object slots are pre-zeroed in ``masks`` (and ``vecs``);
  * all per-object inputs are pre-sorted by ascending sampled mass
    (smaller objects claim pixels first and win overlaps) — the (N, O)
    argsort is tiny and stays in XLA.
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


@functools.partial(jax.jit, static_argnames=("interpret", "tile_h"))
def masks_to_layout_pallas(vecs: jax.Array, ry: jax.Array, rx: jax.Array,
                           masks: jax.Array,
                           interpret: bool = False,
                           tile_h: int = 16) -> jax.Array:
    """Fused occlusion compositor (test mode only; not differentiable).

    Args:
      vecs: (N, O, D) layout vectors, mass-sorted, invalid slots zeroed.
      ry: (N, O, H, M) row interpolation matrices (same order).
      rx: (N, O, W, M) column interpolation matrices.
      masks: (N, O, M, M) soft masks (invalid slots zeroed).

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
        # precision=HIGHEST for the same reason as ops/layout.py:_PRECISION:
        # a single bf16 MXU pass on f32 inputs rounds resampled sigmoid-init
        # masks (0.500x) down to exactly 0.5, so the `> 0.5` claim below
        # fires nowhere and f32 serving composites an all-zero layout.
        # bf16 inputs are one native pass either way (throughput unaffected).
        prec = jax.lax.Precision.HIGHEST
        for k in range(o):
            # Resample object k's mask for this row tile: two MXU matmuls.
            tmp = jnp.dot(ry_ref[k], masks_ref[k],
                          preferred_element_type=jnp.float32,
                          precision=prec)                          # (TH, M)
            sampled = jnp.dot(tmp, rx_ref[k].T,
                              preferred_element_type=jnp.float32,
                              precision=prec)                      # (TH, W)
            binm = (sampled > 0.5).astype(jnp.float32)
            claim = binm * (1.0 - taken)
            taken = jnp.minimum(taken + claim, 1.0)
            weight = sampled * claim
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
