"""Pallas TPU kernel: fused factored-stem conv (rank-O layout x 7x7 stem).

Computes the factored pix2pixHD stem (models/generators.py StemConv)

    out[n,y,x,c] = sum_{dy,dx,o} w_pad[n, y+dy, x+dx, o] * g[n, dy, dx, o, c]

without the XLA 'patches' path's (N, H, W, 441) im2col tensor ever
touching HBM (1.85 GB at batch 128 — the measured reason 'patches' runs
at 18.3 ms there, scripts/stem_microbench.py).

Design (follows the pallas_guide rules: keep the MXU contraction dim
wide, avoid relayouts, keep packing traffic in VMEM):

  * The padded per-object weight field (N, Hp, Wp, O=9) is VMEM-resident
    per image (323 KB real / 4.6 MB lane-padded; the BlockSpec index map
    ignores the row-tile index so Pallas fetches it once per image).
  * Once per image (pl.when(j == 0)) the kernel packs the 7 dy-shifted
    views into a persistent VMEM scratch wE (H, Wp, 7*O -> 64 lanes):
    wE[y, x, dy*9 + o] = w_pad[y+dy, x, o]. Doing this in XLA instead
    costs 5-10 ms at b128 (a 63-lane interleave scatter in HBM, measured
    prep variants in RESULTS.md §23); in VMEM it is ~1 ms of masked lane
    writes amortized over the image's row tiles.
  * Per (image, row-tile): the 7 dx sublane-slices of wE reshape FREELY
    to (TH*W, 64) (major/sublane merge; lanes untouched) and land in the
    patch-matrix scratch P (TH*W, 448) at aligned-ish 64-lane offsets;
    ONE wide MXU dot then contracts K=448 with f32 accumulation —
    writing the accumulator once (a 7-dot accumulate variant re-read the
    512 KB accumulator 7x and measured ~2 ms slower per step).
  * g is pre-permuted/padded in XLA to (N, 7, GROUP, C), rows dy*9+o
    real, zero elsewhere — so the lane padding contributes nothing.

Not differentiable (serving path); training uses the XLA 'patches' form,
which autodiffs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_K = 7       # stem kernel size (7x7)
_GROUP = 64  # lane group: 7 dy-shifts x MAX_OBJS(9) = 63 real, pad to 64


@functools.partial(jax.jit, static_argnames=("interpret", "tile_h"))
def stem_pallas(weights: jax.Array, g: jax.Array,
                interpret: bool = False, tile_h: int = 8) -> jax.Array:
    """Fused factored stem contraction.

    Args:
      weights: (N, Hp, Wp, O) spatially padded per-object weight field
        (Hp = H + 6, Wp = W + 6; reflect padding applied by the caller).
      g: (N, 7, 7, O, C) per-image tap kernels, g = einsum(vecs, K)
        (StemConv factored path).

    Returns:
      (N, H, W, C) stem response EXCLUDING bias (caller adds it).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, hp, wp, o = weights.shape
    _, kh, kw, _, c = g.shape
    assert (kh, kw) == (_K, _K) and _K * o <= _GROUP, (kh, kw, o)
    h, w = hp - (_K - 1), wp - (_K - 1)
    if h % tile_h:
        tile_h = 8 if h % 8 == 0 else h
    dtype = weights.dtype

    # gP[n, dx, dy*9 + o, c] = g[n, dy, dx, o, c]; rows padded to GROUP.
    gp = jnp.transpose(g, (0, 2, 1, 3, 4)).reshape(n, _K, _K * o, c)
    gp = jnp.pad(gp, ((0, 0), (0, 0), (0, _GROUP - _K * o), (0, 0)))

    def kernel(w_ref, gp_ref, out_ref, we_ref, p_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _pack():
            # wE[y, x, dy*9+o] = w_pad[y+dy, x, o]; zero the lane padding
            # once so the K tail contributes nothing.
            we_ref[...] = jnp.zeros_like(we_ref)
            for dy in range(_K):
                we_ref[:, :, dy * o:(dy + 1) * o] = w_ref[dy:dy + h]

        row0 = j * tile_h
        for dx in range(_K):
            piece = we_ref[pl.ds(row0, tile_h), dx:dx + w, :]
            p_ref[:, dx * _GROUP:(dx + 1) * _GROUP] = piece.reshape(
                tile_h * w, _GROUP)
        out = jnp.dot(p_ref[...], gp_ref[...].reshape(_K * _GROUP, c),
                      preferred_element_type=jnp.float32)
        out_ref[...] = out.reshape(tile_h, w, c).astype(out_ref.dtype)

    grid = (n, h // tile_h)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, hp, wp, o), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((None, _K, _GROUP, c), lambda i, j: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, tile_h, w, c), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), dtype),
        scratch_shapes=[pltpu.VMEM((h, wp, _GROUP), dtype),
                        pltpu.VMEM((tile_h * w, _K * _GROUP), dtype)],
        interpret=interpret,
    )(weights, gp)
