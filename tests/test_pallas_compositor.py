"""Pallas fused compositor vs. the XLA path (interpret mode on CPU).

All tests go through the PUBLIC ``masks_to_layout(backend='pallas',
interpret=True)`` API so the production prep path (ops/layout.py:
_masks_to_layout_pallas — zeroing, hat matrices, mass sort) is the code
under test, not a copy of it.
"""
import numpy as np
import pytest
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


def test_matches_xla_path():
    vecs, boxes, masks, obj_mask, h, w = _case()
    want = masks_to_layout(vecs, boxes, masks, obj_mask, h, w,
                           test_mode=True)
    got = masks_to_layout(vecs, boxes, masks, obj_mask, h, w,
                          test_mode=True, backend="pallas",
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)


def test_uneven_tile_height_falls_back():
    vecs, boxes, masks, obj_mask, _, _ = _case(m=8)
    got = masks_to_layout(vecs, boxes, masks, obj_mask, 24, 24,
                          test_mode=True, backend="pallas", interpret=True)
    want = masks_to_layout(vecs, boxes, masks, obj_mask, 24, 24,
                           test_mode=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4,
                               rtol=1e-4)


def test_train_mode_pallas_is_refused():
    """The custom-VJP train pair was removed after losing the honest A/B
    (RESULTS.md §10); the train path must refuse rather than silently
    composite through a non-differentiable kernel."""
    vecs, boxes, masks, obj_mask, h, w = _case()
    with pytest.raises(ValueError, match="test-mode only"):
        masks_to_layout(vecs, boxes, masks, obj_mask, h, w,
                        test_mode=False, backend="pallas", interpret=True)
