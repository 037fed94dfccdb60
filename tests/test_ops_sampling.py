"""Unit tests for the matmul-form bilinear sampling ops.

Golden parity targets:
  * torch.nn.functional.grid_sample(align_corners=True) — the exact kernel
    the reference uses (cuDNN backend default, bilinear.py:26, layout.py:86).
  * the pure-gather oracle bilinear_sample_gather.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from scene_generation_tpu.ops.sampling import (
    interp_matrix, box_sample_matrices, crop_matrices, bilinear_sample_gather)
from scene_generation_tpu.ops.crop import crop_bbox_batch, uncrop_bbox
from scene_generation_tpu.ops.layout import masks_to_layout, _sample_masks

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _rng(seed=0):
    return np.random.RandomState(seed)


def torch_box_grid(boxes, h, w):
    """Reference _boxes_to_grid (layout.py:96-128), verbatim math in numpy."""
    boxes = torch.as_tensor(boxes, dtype=torch.float32)
    o = boxes.shape[0]
    boxes = boxes.view(o, 4, 1, 1)
    x0, y0 = boxes[:, 0], boxes[:, 1]
    ww, hh = boxes[:, 2] - x0, boxes[:, 3] - y0
    X = torch.linspace(0, 1, steps=w).view(1, 1, w)
    Y = torch.linspace(0, 1, steps=h).view(1, h, 1)
    X = (X - x0) / ww
    Y = (Y - y0) / hh
    X = X.expand(o, h, w)
    Y = Y.expand(o, h, w)
    grid = torch.stack([X, Y], dim=3)
    return grid.mul(2).sub(1)


class TestInterpMatrix:
    def test_identity(self):
        coords = jnp.arange(5.0)
        r = interp_matrix(coords, 5)
        np.testing.assert_allclose(np.asarray(r), np.eye(5), atol=1e-6)

    def test_midpoint(self):
        r = interp_matrix(jnp.array([1.5]), 4)
        np.testing.assert_allclose(np.asarray(r[0]), [0, .5, .5, 0], atol=1e-6)

    def test_out_of_range_zero_padding(self):
        r = interp_matrix(jnp.array([-0.25, 3.75, -2.0, 9.0]), 4)
        r = np.asarray(r)
        # Partial rows at the boundary (zeros padding blur).
        np.testing.assert_allclose(r[0], [.75, 0, 0, 0], atol=1e-6)
        np.testing.assert_allclose(r[1], [0, 0, 0, .25], atol=1e-6)
        # Fully outside -> all-zero rows.
        np.testing.assert_allclose(r[2], 0, atol=1e-6)
        np.testing.assert_allclose(r[3], 0, atol=1e-6)


class TestMaskSamplingVsTorch:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_grid_sample(self, seed):
        """Mask resample path == F.grid_sample on the reference's grid."""
        rng = _rng(seed)
        o, m, h, w = 5, 8, 24, 20
        masks = rng.rand(o, m, m).astype(np.float32)
        # Boxes partially out of frame to exercise zero padding.
        x0 = rng.uniform(-0.2, 0.6, o)
        y0 = rng.uniform(-0.2, 0.6, o)
        boxes = np.stack([x0, y0,
                          x0 + rng.uniform(0.1, 0.7, o),
                          y0 + rng.uniform(0.1, 0.7, o)], 1).astype(np.float32)

        grid = torch_box_grid(boxes, h, w)
        want = F.grid_sample(torch.as_tensor(masks)[:, None], grid,
                             mode="bilinear", padding_mode="zeros",
                             align_corners=True)[:, 0].numpy()

        got = _sample_masks(jnp.asarray(boxes)[None], jnp.asarray(masks)[None],
                            h, w)[0]
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_matches_gather_oracle(self):
        rng = _rng(2)
        m, h, w = 6, 16, 16
        mask = rng.rand(m, m).astype(np.float32)
        box = np.array([0.2, -0.1, 0.9, 0.8], np.float32)
        ry, rx = box_sample_matrices(jnp.asarray(box), h, w, m)
        got = ry @ jnp.asarray(mask) @ rx.T

        xs = (np.linspace(0, 1, w) - box[0]) / (box[2] - box[0]) * (m - 1)
        ys = (np.linspace(0, 1, h) - box[1]) / (box[3] - box[1]) * (m - 1)
        px, py = np.meshgrid(xs, ys)
        want = bilinear_sample_gather(jnp.asarray(mask), jnp.asarray(px),
                                      jnp.asarray(py))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


class TestCropVsTorch:
    @pytest.mark.parametrize("seed", [0, 3])
    def test_matches_reference_cudnn_crop(self, seed):
        """crop_bbox_batch == reference crop_bbox(backend='cudnn')
        (bilinear.py:101-130): box -> [-1,1], tensor_linspace grid,
        grid_sample align_corners=True."""
        rng = _rng(seed)
        n, o, h, w, c, hh = 2, 3, 32, 28, 3, 12
        imgs = rng.rand(n, h, w, c).astype(np.float32)
        x0 = rng.uniform(0, 0.5, (n, o))
        y0 = rng.uniform(0, 0.5, (n, o))
        boxes = np.stack([x0, y0,
                          x0 + rng.uniform(0.1, 0.5, (n, o)),
                          y0 + rng.uniform(0.1, 0.5, (n, o)), ], -1
                         ).astype(np.float32)

        got = crop_bbox_batch(jnp.asarray(imgs), jnp.asarray(boxes), hh)

        timgs = torch.as_tensor(imgs).permute(0, 3, 1, 2)  # NCHW
        for i in range(n):
            bb = torch.as_tensor(2 * boxes[i] - 1)
            X = (torch.linspace(0, 1, hh)[None] * (bb[:, 2] - bb[:, 0])[:, None]
                 + bb[:, 0][:, None])
            Y = (torch.linspace(0, 1, hh)[None] * (bb[:, 3] - bb[:, 1])[:, None]
                 + bb[:, 1][:, None])
            grid = torch.stack([X.view(o, 1, hh).expand(o, hh, hh),
                                Y.view(o, hh, 1).expand(o, hh, hh)], dim=3)
            want = F.grid_sample(timgs[i:i + 1].expand(o, c, h, w), grid,
                                 mode="bilinear", padding_mode="zeros",
                                 align_corners=True)
            want = want.permute(0, 2, 3, 1).numpy()
            np.testing.assert_allclose(np.asarray(got[i]), want, atol=1e-5)

    def test_full_image_box_is_identity(self):
        rng = _rng(1)
        img = rng.rand(16, 16, 1).astype(np.float32)
        boxes = np.array([[[0, 0, 1, 1]]], np.float32)
        got = crop_bbox_batch(jnp.asarray(img)[None], jnp.asarray(boxes), 16)
        np.testing.assert_allclose(np.asarray(got[0, 0]), img, atol=1e-5)

    def test_gradients_flow(self):
        import jax
        rng = _rng(4)
        imgs = jnp.asarray(rng.rand(1, 16, 16, 2).astype(np.float32))
        boxes = jnp.asarray(np.array([[[.1, .1, .8, .9]]], np.float32))

        def f(b):
            return crop_bbox_batch(imgs, b, 8).sum()

        g = jax.grad(f)(boxes)
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.abs(np.asarray(g)).sum() > 0


class TestUncrop:
    def test_roundtrip_center(self):
        rng = _rng(5)
        feats = jnp.asarray(rng.rand(1, 1, 8, 8, 2).astype(np.float32))
        boxes = jnp.asarray(np.array([[[0.25, 0.25, 0.75, 0.75]]], np.float32))
        out = uncrop_bbox(feats, boxes, 32)
        assert out.shape == (1, 1, 32, 32, 2)
        # Outside the box everything is zero.
        assert float(jnp.abs(out[0, 0, :4, :, :]).sum()) == 0.0
        assert float(jnp.abs(out[0, 0, :, :4, :]).sum()) == 0.0
        # Center of the box carries the feature mass.
        assert float(jnp.abs(out[0, 0, 12:20, 12:20]).sum()) > 0
