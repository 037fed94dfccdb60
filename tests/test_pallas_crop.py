"""Fused Pallas ROI crop vs. the XLA path (interpret mode on CPU), through
the public ``crop_bbox_batch(backend='pallas', interpret=True)`` API."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scene_generation_tpu.ops.crop import crop_bbox_batch
from scene_generation_tpu.ops.pallas.compositor import pallas_available

pytestmark = pytest.mark.skipif(not pallas_available(),
                                reason="pallas unavailable")


def _case(seed=0, n=2, o=4, h=32, w=32, c=3):
    rng = np.random.RandomState(seed)
    imgs = rng.rand(n, h, w, c).astype(np.float32)
    x0 = rng.uniform(0, .5, (n, o))
    y0 = rng.uniform(0, .5, (n, o))
    boxes = np.stack([x0, y0, x0 + rng.uniform(.2, .5, (n, o)),
                      y0 + rng.uniform(.2, .5, (n, o))], -1).astype(np.float32)
    # One degenerate box and one partially out-of-frame box.
    boxes[0, 0] = [0.3, 0.3, 0.3, 0.8]
    boxes[0, 1] = [0.7, 0.7, 1.4, 1.4]
    return jnp.asarray(imgs), jnp.asarray(boxes)


@pytest.mark.parametrize("hh", [8, 16])
def test_forward_matches_xla(hh):
    imgs, boxes = _case()
    want = crop_bbox_batch(imgs, boxes, hh, backend="xla")
    got = crop_bbox_batch(imgs, boxes, hh, backend="pallas", interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_rectangular_crop():
    imgs, boxes = _case()
    want = crop_bbox_batch(imgs, boxes, 8, 16, backend="xla")
    got = crop_bbox_batch(imgs, boxes, 8, 16, backend="pallas",
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_gradients_match_xla():
    imgs, boxes = _case(1)
    g_target = jnp.asarray(
        np.random.RandomState(7).randn(2, 4, 8, 8, 3).astype(np.float32))

    def loss(backend, imgs, boxes):
        out = crop_bbox_batch(imgs, boxes, 8, backend=backend,
                              interpret=True)
        return jnp.sum(out * g_target)

    gp = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1))(imgs, boxes)
    gx = jax.grad(lambda *a: loss("xla", *a), argnums=(0, 1))(imgs, boxes)
    for a, b, name in zip(gp, gx, ("imgs", "boxes")):
        arr_a, arr_b = np.asarray(a), np.asarray(b)
        assert np.isfinite(arr_a).all(), name
        scale = np.abs(arr_b).max() + 1e-8
        np.testing.assert_allclose(
            arr_a, arr_b, atol=2e-5 * max(1.0, scale), rtol=1e-4,
            err_msg=f"grad mismatch: {name}")
    # Gradients are nonzero where they should be.
    assert np.abs(np.asarray(gp[0])).sum() > 0
    assert np.abs(np.asarray(gp[1])).sum() > 0
