"""Pallas fused compositor vs. the XLA path (interpret mode on CPU).

All tests go through the PUBLIC ``masks_to_layout(backend='pallas',
interpret=True)`` API so the production prep path (ops/layout.py:
_masks_to_layout_pallas — zeroing, hat matrices, mass sort) is the code
under test, not a copy of it.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scene_generation_tpu.ops.layout import masks_to_layout
from scene_generation_tpu.ops.pallas.compositor import pallas_available

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


@pytest.mark.parametrize("test_mode", [False, True])
def test_matches_xla_path(test_mode):
    vecs, boxes, masks, obj_mask, h, w = _case()
    want = masks_to_layout(vecs, boxes, masks, obj_mask, h, w,
                           test_mode=test_mode)
    got = masks_to_layout(vecs, boxes, masks, obj_mask, h, w,
                          test_mode=test_mode, backend="pallas",
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)


def test_uneven_tile_height_falls_back():
    vecs, boxes, masks, obj_mask, _, _ = _case(m=8)
    got = masks_to_layout(vecs, boxes, masks, obj_mask, 24, 24,
                          backend="pallas", interpret=True)
    want = masks_to_layout(vecs, boxes, masks, obj_mask, 24, 24)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4,
                               rtol=1e-4)


class TestCustomVJP:
    """Train-path kernel pair: forward + gradient parity with the XLA path
    (interpret mode), through the public API."""

    def test_forward_matches(self):
        vecs, boxes, masks, obj_mask, h, w = _case()
        got = masks_to_layout(vecs, boxes, masks, obj_mask, h, w,
                              test_mode=False, backend="pallas",
                              interpret=True)
        want = masks_to_layout(vecs, boxes, masks, obj_mask, h, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=1e-4)

    def test_gradients_match_xla(self):
        vecs, boxes, masks, obj_mask, h, w = _case(1)

        def loss(backend, vecs, boxes, masks):
            out = masks_to_layout(vecs, boxes, masks, obj_mask, h, w,
                                  backend=backend, interpret=True)
            return jnp.sum(out * out)

        gp = jax.grad(lambda *a: loss("pallas", *a),
                      argnums=(0, 1, 2))(vecs, boxes, masks)
        gx = jax.grad(lambda *a: loss("xla", *a),
                      argnums=(0, 1, 2))(vecs, boxes, masks)
        for a, b, name in zip(gp, gx, ("vecs", "boxes", "masks")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-3,
                err_msg=f"grad mismatch: {name}")
