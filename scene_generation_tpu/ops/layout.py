"""Layout composition: per-object vectors + boxes + masks -> spatial layout.

TPU-native re-design of the reference compositor (``layout.py:64-184``):

  * The reference materializes ``vec (x) mask`` as an (O, D, M, M) tensor and
    grid-samples all D channels (``layout.py:85-86``). Sampling is linear, so
    we resample the 1-channel mask once and contract with the vectors on the
    MXU afterwards — a ~D-fold FLOP/HBM saving (D = num_classes + rep_size,
    204 by default).
  * The per-image Python loop over ``obj_to_img`` (``layout.py:149-169``,
    a GPU-sync hot spot) becomes a vmap over the padded batch axis.
  * Test-mode occlusion-ordered compositing (``layout.py:157-169``: objects
    sorted by sampled mass ascending, each claims still-unclaimed pixels
    where its resampled clean mask > 0.5) is expressed as argsort + exclusive
    cumulative-max along the (static, small) object axis — fully inside XLA.

Shapes follow the padded batch contract: leading (N, O) with a validity mask
instead of the reference's flat ragged axis.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from scene_generation_tpu.ops.sampling import box_sample_matrices

# TPU matmuls with f32 inputs default to ONE bf16xbf16 MXU pass, whose
# ~8-bit mantissa rounds resampled sigmoid-init masks (0.500x) down to
# exactly 0.5 — the test-mode `> 0.5` claim then fires nowhere and the
# whole weight field (hence the generated image) is exactly zero
# (observed on v5e at image_size=64; 128 survived only by init luck).
# HIGHEST restores true-f32 passes for f32 inputs, keeping the op's
# pinned torch-grid_sample semantics on TPU; bf16 inputs are a single
# native pass either way, so serving throughput is unaffected.
_PRECISION = jax.lax.Precision.HIGHEST


def _sample_masks(boxes: jax.Array, masks: jax.Array, h: int, w: int):
    """Resample (N, O, M, M) masks into image space -> (N, O, H, W)."""
    m = masks.shape[-1]
    ry, rx = box_sample_matrices(boxes, h, w, m)        # (N,O,H,M), (N,O,W,M)
    # sampled[n,o,h,w] = sum_{i,j} ry[n,o,h,i] mask[n,o,i,j] rx[n,o,w,j]
    tmp = jnp.einsum("nohi,noij->nohj", ry, masks.astype(ry.dtype),
                     preferred_element_type=ry.dtype, precision=_PRECISION)
    return jnp.einsum("nohj,nowj->nohw", tmp, rx,
                      preferred_element_type=ry.dtype, precision=_PRECISION)


def masks_to_layout_weights(vecs: jax.Array, boxes: jax.Array,
                            masks: jax.Array, obj_mask: jax.Array,
                            h: int, w: Optional[int] = None,
                            test_mode: bool = False,
                            occlusion_impl: str = "matrix") -> jax.Array:
    """Per-object spatial weights of the layout's rank-O factorization.

    The composed layout is ALWAYS a sum of per-object rank-1 terms,
    ``layout[n,y,x,:] = sum_o weights[n,o,y,x] * vecs[n,o,:]`` — both the
    train-mode sum (reference ``layout.py:149-155``) and the test-mode
    occlusion compositor (``layout.py:157-169``) only differ in how the
    (N, O, H, W) weight field is built. Exposing the factor lets consumers
    whose first op is linear in the layout (the pix2pixHD 7x7 stem,
    ``models/generators.py StemConv``) contract against the O-dim factor
    instead of the D-dim materialized layout — a D/O (~22x at COCO scale)
    FLOP/HBM reduction with bitwise-equal semantics up to reassociation.

    Returns (N, O, H, W) weights in the ORIGINAL object-slot order
    (invalid slots are all-zero).
    """
    if w is None:
        w = h
    dtype = vecs.dtype
    sampled = _sample_masks(boxes, masks.astype(dtype), h, w)   # (N,O,H,W)
    valid = obj_mask.astype(dtype)[:, :, None, None]
    sampled = sampled * valid
    if not test_mode:
        return sampled

    # Occlusion ordering (layout.py:157-169): objects sorted by total
    # sampled mass ascending; each claims still-unclaimed pixels where its
    # clean resampled mask > 0.5. ``clean`` is the identical resample of
    # the same masks (layout.py:88), so it aliases ``sampled``.
    mass = jnp.sum(vecs, axis=-1) * jnp.sum(sampled, axis=(-1, -2))  # (N,O)
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    mass = jnp.where(obj_mask.astype(bool), mass, big)

    binm_f = ((sampled > 0.5).astype(dtype)
              * obj_mask.astype(dtype)[:, :, None, None])           # (N,O,H,W)

    if occlusion_impl == "matrix":
        # Gather-free formulation: "has any earlier object claimed this
        # pixel" only needs WHICH objects precede each object, not an
        # actual sort. precede[n,p,o] = 1 iff p comes before o in the
        # mass-ascending stable order (ties break on the original index,
        # matching jnp.argsort's stable sort below), so
        #   prev_taken[n,o,y,x] = min(1, sum_p precede[n,p,o] binm[n,p,y,x])
        # is ONE (O,O)x(O,HW) batched matmul — no argsort, no per-image
        # gathers, no cumsum, no un-permute. Bitwise-identical output
        # (binm is {0,1} so the sum is an exact small integer; the sort
        # path's final take(inv) round-trip is an identity permutation of
        # the same products). Measured: the sort form's gather chain
        # defeats XLA fusion inside the full serving program (RESULTS §32).
        o_idx = jnp.arange(mass.shape[1])
        lt = mass[:, :, None] < mass[:, None, :]                     # p < o
        tie = ((mass[:, :, None] == mass[:, None, :])
               & (o_idx[:, None] < o_idx[None, :]))
        precede = (lt | tie).astype(dtype)                           # (N,P,O)
        prev_taken = jnp.minimum(
            jnp.einsum("npo,nphw->nohw", precede, binm_f,
                       preferred_element_type=dtype,
                       precision=_PRECISION), 1.0)
        return sampled * binm_f * (1.0 - prev_taken)

    if occlusion_impl != "sort":
        raise ValueError(f"unknown occlusion_impl {occlusion_impl!r}")

    order = jnp.argsort(mass, axis=-1)                               # (N,O)

    def per_image(sampled_i, binm_i, order_i):
        s = jnp.take(sampled_i, order_i, axis=0)     # (O,H,W)
        binm = jnp.take(binm_i, order_i, axis=0)
        # Exclusive cumulative max: has any earlier object claimed this
        # pixel?
        taken = jnp.cumsum(binm, axis=0)
        prev_taken = jnp.minimum(taken - binm, 1.0)
        claim = binm * (1.0 - prev_taken)            # (O,H,W)
        # Un-permute so weights align with the caller's vec order.
        inv = jnp.argsort(order_i)
        return jnp.take(s * claim, inv, axis=0)

    return jax.vmap(per_image)(sampled, binm_f, order)


def masks_to_layout(vecs: jax.Array, boxes: jax.Array, masks: jax.Array,
                    obj_mask: jax.Array, h: int, w: Optional[int] = None,
                    test_mode: bool = False,
                    backend: str = "xla",
                    interpret: bool = False) -> jax.Array:
    """Compose per-object vectors into a spatial layout tensor.

    Equivalent of reference ``masks_to_layout`` (``layout.py:64-93``) with
    ``_pool_samples`` (``layout.py:131-184``) fused in.

    Args:
      vecs: (N, O, D) per-object layout vectors.
      boxes: (N, O, 4) [x0, y0, x1, y1] in [0, 1] image coords.
      masks: (N, O, M, M) soft masks in [0, 1].
      obj_mask: (N, O) validity of each object slot (1 = real object).
      h, w: output spatial size.
      test_mode: if True use occlusion-ordered compositing (layout.py:157-169)
        instead of summation over objects (layout.py:149-155).
      backend: 'xla' | 'pallas' | 'auto'. 'auto' picks the fused Pallas
        occlusion compositor for TEST mode on TPU (+24% end-to-end
        serving: 1237 vs 996 img/s @ batch 16 bf16, measured 2026-08-17
        with forced-readback timing) and XLA everywhere else. The TRAIN
        path is XLA-only: the custom-VJP Pallas pair was step-level
        indistinguishable (74.8 vs 74.6 ms) and 8x slower at the
        op-level backward (4.8 vs 0.6 ms), so it was removed
        (RESULTS.md §10); requesting backend='pallas' with
        test_mode=False raises.
      interpret: run the Pallas kernels in interpret mode (CPU testing of
        the production prep path; ignored for the XLA backend).

    Returns:
      (N, H, W, D) layout (NHWC; the reference returns NCHW).
    """
    if w is None:
        w = h
    dtype = vecs.dtype
    if backend == "auto":
        backend = ("pallas" if (test_mode
                                and jax.default_backend() == "tpu")
                   else "xla")
    if backend == "pallas":
        if not test_mode:
            raise ValueError(
                "backend='pallas' is test-mode only: the differentiable "
                "custom-VJP train pair was removed after losing the honest "
                "hardware A/B to XLA (op-level backward 4.8 vs 0.6 ms; "
                "RESULTS.md §10)")
        return _masks_to_layout_pallas(vecs, boxes, masks, obj_mask, h, w,
                                       interpret)
    # XLA backend: build the per-object weight field (train sum or test
    # occlusion claims — layout.py:149-169) and contract it with the vecs.
    weights = masks_to_layout_weights(vecs, boxes, masks, obj_mask, h, w,
                                      test_mode=test_mode)
    return jnp.einsum("nohw,nod->nhwd", weights, vecs,
                      preferred_element_type=dtype, precision=_PRECISION)


def _masks_to_layout_pallas(vecs, boxes, masks, obj_mask, h, w,
                            interpret=False):
    """Fused occlusion-kernel backend (ops/pallas/compositor.py), test mode
    only. Host-side prep: zero invalid slots, build interpolation matrices,
    and sort objects by ascending sampled mass — the kernel composites in
    order."""
    from scene_generation_tpu.ops.pallas.compositor import (
        masks_to_layout_pallas)
    dtype = vecs.dtype
    m = masks.shape[-1]
    valid = obj_mask.astype(dtype)
    masks = masks.astype(dtype) * valid[:, :, None, None]
    vecs = vecs * valid[..., None]
    ry, rx = box_sample_matrices(boxes.astype(dtype), h, w, m)

    # mass of vec (x) sampled mask = sum(vec) * sum(sampled); the sum of
    # the separable resample factorizes over the marginals of ry/rx.
    sampled_sum = jnp.einsum("nom,nomk,nok->no", ry.sum(axis=2), masks,
                             rx.sum(axis=2), precision=_PRECISION)
    mass = jnp.sum(vecs, axis=-1) * sampled_sum
    big = jnp.asarray(jnp.finfo(jnp.float32).max, mass.dtype)
    mass = jnp.where(valid.astype(bool), mass, big)
    order = jnp.argsort(mass, axis=-1)
    take = lambda x: jnp.take_along_axis(
        x, order.reshape(order.shape + (1,) * (x.ndim - 2)), axis=1)
    vecs, ry, rx, masks = take(vecs), take(ry), take(rx), take(masks)

    return masks_to_layout_pallas(vecs, ry, rx, masks, interpret=interpret)


def boxes_to_layout(vecs: jax.Array, boxes: jax.Array, obj_mask: jax.Array,
                    h: int, w: Optional[int] = None) -> jax.Array:
    """Mask-free layout (reference ``boxes_to_layout``, layout.py:28-61).

    The reference expands each vector to a constant 8x8 patch and
    grid-samples it; equivalent here to compositing all-ones 8x8 masks.
    """
    n, o, _ = vecs.shape
    ones = jnp.ones((n, o, 8, 8), dtype=vecs.dtype)
    return masks_to_layout(vecs, boxes, ones, obj_mask, h, w, test_mode=False)
