"""Pallas fused compositor vs. the XLA path (interpret mode on CPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scene_generation_tpu.ops.layout import (
    masks_to_layout, _masks_to_layout_pallas, box_sample_matrices)
from scene_generation_tpu.ops.pallas.compositor import (
    masks_to_layout_pallas, pallas_available)

pytestmark = pytest.mark.skipif(not pallas_available(),
                                reason="pallas unavailable")


def _case(seed=0, n=2, o=4, d=8, m=8, h=32, w=32):
    rng = np.random.RandomState(seed)
    vecs = rng.rand(n, o, d).astype(np.float32)
    x0 = rng.uniform(0, .5, (n, o))
    y0 = rng.uniform(0, .5, (n, o))
    boxes = np.stack([x0, y0, x0 + rng.uniform(.2, .5, (n, o)),
                      y0 + rng.uniform(.2, .5, (n, o))], -1).astype(np.float32)
    masks = (rng.rand(n, o, m, m) > 0.35).astype(np.float32)
    obj_mask = np.ones((n, o), np.float32)
    obj_mask[0, -1] = 0  # one padded slot with junk
    vecs[0, -1] = 55.0
    masks[0, -1] = 1.0
    return (jnp.asarray(vecs), jnp.asarray(boxes), jnp.asarray(masks),
            jnp.asarray(obj_mask), h, w)


def _pallas_interpret(vecs, boxes, masks, obj_mask, h, w, test_mode):
    """Same prep as _masks_to_layout_pallas but with interpret=True."""
    dtype = vecs.dtype
    m = masks.shape[-1]
    valid = obj_mask.astype(dtype)
    masks = masks.astype(dtype) * valid[:, :, None, None]
    vecs = vecs * valid[..., None]
    ry, rx = box_sample_matrices(boxes.astype(dtype), h, w, m)
    if test_mode:
        sampled_sum = jnp.einsum("nom,nomk,nok->no", ry.sum(axis=2), masks,
                                 rx.sum(axis=2))
        mass = jnp.sum(vecs, axis=-1) * sampled_sum
        big = jnp.asarray(np.finfo(np.float32).max, mass.dtype)
        mass = jnp.where(valid.astype(bool), mass, big)
        order = jnp.argsort(mass, axis=-1)
        take = lambda x: jnp.take_along_axis(
            x, order.reshape(order.shape + (1,) * (x.ndim - 2)), axis=1)
        vecs, ry, rx, masks = take(vecs), take(ry), take(rx), take(masks)
    return masks_to_layout_pallas(vecs, ry, rx, masks, test_mode=test_mode,
                                  interpret=True)


@pytest.mark.parametrize("test_mode", [False, True])
def test_matches_xla_path(test_mode):
    vecs, boxes, masks, obj_mask, h, w = _case()
    want = masks_to_layout(vecs, boxes, masks, obj_mask, h, w,
                           test_mode=test_mode)
    got = _pallas_interpret(vecs, boxes, masks, obj_mask, h, w, test_mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)


def test_uneven_tile_height_falls_back():
    vecs, boxes, masks, obj_mask, _, _ = _case(m=8)
    got = _pallas_interpret(vecs, boxes, masks, obj_mask, 24, 24, False)
    want = masks_to_layout(vecs, boxes, masks, obj_mask, 24, 24)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4,
                               rtol=1e-4)


class TestCustomVJP:
    """Train-path kernel pair: forward + gradient parity with the XLA path
    (interpret mode)."""

    def _inputs(self, seed=0):
        vecs, boxes, masks, obj_mask, h, w = _case(seed)
        dtype = vecs.dtype
        valid = obj_mask.astype(dtype)
        masks_z = masks.astype(dtype) * valid[:, :, None, None]
        vecs_z = vecs * valid[..., None]
        ry, rx = box_sample_matrices(boxes, h, w, masks.shape[-1])
        return vecs, boxes, masks, obj_mask, vecs_z, ry, rx, masks_z, h, w

    def test_forward_matches(self):
        from scene_generation_tpu.ops.pallas.compositor import compose_train
        (vecs, boxes, masks, obj_mask, vecs_z, ry, rx, masks_z,
         h, w) = self._inputs()
        got = compose_train(True, 8, vecs_z, ry, rx, masks_z)
        want = masks_to_layout(vecs, boxes, masks, obj_mask, h, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=1e-4)

    def test_gradients_match_xla(self):
        from scene_generation_tpu.ops.pallas.compositor import compose_train
        (vecs, boxes, masks, obj_mask, *_rest) = self._inputs(1)
        h, w = 32, 32
        m = masks.shape[-1]
        dtype = vecs.dtype

        def pallas_loss(vecs, boxes, masks):
            valid = obj_mask.astype(dtype)
            mk = masks.astype(dtype) * valid[:, :, None, None]
            vz = vecs * valid[..., None]
            ry, rx = box_sample_matrices(boxes, h, w, m)
            out = compose_train(True, 8, vz, ry, rx, mk)
            return jnp.sum(out * out)

        def xla_loss(vecs, boxes, masks):
            out = masks_to_layout(vecs, boxes, masks, obj_mask, h, w)
            return jnp.sum(out * out)

        gp = jax.grad(pallas_loss, argnums=(0, 1, 2))(vecs, boxes, masks)
        gx = jax.grad(xla_loss, argnums=(0, 1, 2))(vecs, boxes, masks)
        for a, b, name in zip(gp, gx, ("vecs", "boxes", "masks")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-3,
                err_msg=f"grad mismatch: {name}")
