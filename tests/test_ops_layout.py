"""Layout compositor tests: parity with a literal numpy/torch port of the
reference ``masks_to_layout`` + ``_pool_samples`` (layout.py:64-184), in both
the train (sum) and test (occlusion-ordered) paths."""
import numpy as np
import pytest
import jax.numpy as jnp

from scene_generation_tpu.ops.layout import masks_to_layout, boxes_to_layout

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def reference_masks_to_layout(vecs, boxes, masks, h, w, test_mode):
    """Oracle: the reference algorithm for ONE image, ragged O, via torch."""
    o, d = vecs.shape
    m = masks.shape[1]
    tb = torch.as_tensor(boxes).view(o, 4, 1, 1)
    x0, y0 = tb[:, 0], tb[:, 1]
    ww, hh = tb[:, 2] - x0, tb[:, 3] - y0
    X = ((torch.linspace(0, 1, w).view(1, 1, w) - x0) / ww).expand(o, h, w)
    Y = ((torch.linspace(0, 1, h).view(1, h, 1) - y0) / hh).expand(o, h, w)
    grid = torch.stack([X, Y], dim=3).mul(2).sub(1)

    img_in = (torch.as_tensor(vecs).view(o, d, 1, 1)
              * torch.as_tensor(masks).view(o, 1, m, m))
    sampled = F.grid_sample(img_in, grid, align_corners=True,
                            padding_mode="zeros")
    if not test_mode:
        return sampled.sum(dim=0).permute(1, 2, 0).numpy()

    clean = F.grid_sample(torch.as_tensor(masks).view(o, 1, m, m), grid,
                          align_corners=True, padding_mode="zeros")
    mass = [float(sampled[j].sum()) for j in range(o)]
    argsort = np.argsort(mass)
    result = torch.zeros((d, h, w))
    result_clean = torch.zeros((h, w))
    for j in argsort:
        masked = (result_clean == 0).float() * (clean[j, 0] > 0.5).float()
        result_clean += masked
        result += sampled[j] * masked
    return result.permute(1, 2, 0).numpy()


def _make_case(seed, n=2, o_real=(3, 2), o_pad=5, d=4, m=8, h=24, w=24):
    rng = np.random.RandomState(seed)
    vecs = np.zeros((n, o_pad, d), np.float32)
    boxes = np.zeros((n, o_pad, 4), np.float32)
    boxes[..., 2:] = 1.0  # keep padded boxes non-degenerate
    masks = np.zeros((n, o_pad, m, m), np.float32)
    obj_mask = np.zeros((n, o_pad), np.float32)
    per_image = []
    for i in range(n):
        k = o_real[i]
        v = rng.rand(k, d).astype(np.float32) + 0.1
        x0 = rng.uniform(0, 0.5, k)
        y0 = rng.uniform(0, 0.5, k)
        b = np.stack([x0, y0, x0 + rng.uniform(0.2, 0.5, k),
                      y0 + rng.uniform(0.2, 0.5, k)], 1).astype(np.float32)
        mk = (rng.rand(k, m, m) > 0.3).astype(np.float32)
        vecs[i, :k], boxes[i, :k], masks[i, :k] = v, b, mk
        obj_mask[i, :k] = 1
        # Junk in padded slots must not leak into the output.
        vecs[i, k:] = 99.0
        masks[i, k:] = 1.0
        per_image.append((v, b, mk))
    return vecs, boxes, masks, obj_mask, per_image, (h, w)


@pytest.mark.parametrize("test_mode", [False, True])
@pytest.mark.parametrize("seed", [0, 7])
def test_matches_reference(seed, test_mode):
    vecs, boxes, masks, obj_mask, per_image, (h, w) = _make_case(seed)
    got = masks_to_layout(jnp.asarray(vecs), jnp.asarray(boxes),
                          jnp.asarray(masks), jnp.asarray(obj_mask),
                          h, w, test_mode=test_mode)
    for i, (v, b, mk) in enumerate(per_image):
        want = reference_masks_to_layout(v, b, mk, h, w, test_mode)
        np.testing.assert_allclose(np.asarray(got[i]), want, atol=2e-4)


def test_padding_slots_do_not_leak():
    vecs, boxes, masks, obj_mask, _, (h, w) = _make_case(3)
    base = masks_to_layout(jnp.asarray(vecs), jnp.asarray(boxes),
                           jnp.asarray(masks), jnp.asarray(obj_mask), h, w)
    vecs2 = vecs.copy()
    vecs2[obj_mask == 0] = -1234.5
    other = masks_to_layout(jnp.asarray(vecs2), jnp.asarray(boxes),
                            jnp.asarray(masks), jnp.asarray(obj_mask), h, w)
    np.testing.assert_allclose(np.asarray(base), np.asarray(other))


def test_occlusion_order_small_wins():
    """Smaller-mass object claims overlapping pixels (layout.py:165-168)."""
    h = w = 16
    vecs = np.array([[[1.0, 0.0], [0.0, 1.0]]], np.float32)  # obj0 big, obj1 small
    boxes = np.array([[[0., 0., 1., 1.], [0.25, 0.25, 0.75, 0.75]]], np.float32)
    masks = np.ones((1, 2, 4, 4), np.float32)
    obj_mask = np.ones((1, 2), np.float32)
    out = masks_to_layout(jnp.asarray(vecs), jnp.asarray(boxes),
                          jnp.asarray(masks), jnp.asarray(obj_mask),
                          h, w, test_mode=True)
    out = np.asarray(out)
    center = out[0, 8, 8]
    # The small object (channel 1) wins the center pixel outright.
    assert center[1] > 0.9 and center[0] == 0.0
    corner = out[0, 1, 1]
    assert corner[0] > 0.5 and corner[1] == 0.0


def test_boxes_to_layout_shape_and_mass():
    vecs = jnp.ones((1, 2, 3))
    boxes = jnp.asarray(np.array([[[0, 0, .5, .5], [.5, .5, 1, 1]]], np.float32))
    out = boxes_to_layout(vecs, boxes, jnp.ones((1, 2)), 32)
    assert out.shape == (1, 32, 32, 3)
    assert float(out.sum()) > 0


def test_jit_and_grad():
    import jax
    vecs, boxes, masks, obj_mask, _, (h, w) = _make_case(1)

    @jax.jit
    def f(v, b, mk):
        out = masks_to_layout(v, b, mk, jnp.asarray(obj_mask), h, w)
        return (out ** 2).sum()

    g = jax.grad(f)(jnp.asarray(vecs), jnp.asarray(boxes), jnp.asarray(masks))
    assert all(np.all(np.isfinite(np.asarray(x))) for x in g)


def test_backend_auto_resolution_per_path():
    """'auto' = XLA for the train path everywhere and for test mode off-TPU
    (the Pallas occlusion compositor only wins test-mode serving on TPU:
    +24% measured; the train pair measured op-level slower — RESULTS.md
    section 10). On CPU both must take the XLA branch and agree with the
    explicit backend."""
    import numpy as np
    import jax.numpy as jnp
    from scene_generation_tpu.ops.layout import masks_to_layout

    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.rand(2, 3, 4), jnp.float32)
    b = jnp.asarray([[[0.1, 0.1, 0.6, 0.5], [0.3, 0.2, 0.9, 0.8],
                      [0.0, 0.0, 1.0, 1.0]]] * 2, jnp.float32)
    m = jnp.asarray(rng.rand(2, 3, 8, 8), jnp.float32)
    om = jnp.ones((2, 3), jnp.float32)
    for test_mode in (False, True):
        auto = masks_to_layout(v, b, m, om, 16, 16, test_mode=test_mode,
                               backend="auto")
        xla = masks_to_layout(v, b, m, om, 16, 16, test_mode=test_mode,
                              backend="xla")
        np.testing.assert_array_equal(np.asarray(auto), np.asarray(xla))


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_occlusion_matrix_impl_bitwise_matches_sort(dtype):
    """The gather-free precedence-matrix occlusion (the serving default
    since round 4 — the argsort/gather/cumsum chain defeated XLA fusion
    inside the full program, RESULTS.md §32) must be BITWISE equal to the
    sort formulation, including mass ties (duplicated objects) and
    invalid slots."""
    import jax
    import jax.numpy as jnp
    from scene_generation_tpu.ops.layout import masks_to_layout_weights

    dt = jnp.dtype(dtype)
    for trial in range(3):
        ks = jax.random.split(jax.random.PRNGKey(100 + trial), 5)
        n, o, m = 4, 9, 16
        lo = jax.random.uniform(ks[0], (n, o, 2), dt, 0.0, 0.6)
        sz = jax.random.uniform(ks[1], (n, o, 2), dt, 0.1, 0.4)
        boxes = jnp.concatenate([lo, lo + sz], -1)
        masks = jax.random.uniform(ks[2], (n, o, m, m), dt)
        vecs = jax.random.normal(ks[3], (n, o, 12), dt)
        obj_mask = (jax.random.uniform(ks[4], (n, o)) > 0.3).astype(
            jnp.float32)
        # Force exact mass ties: slot 3 duplicates slot 2 entirely.
        masks = masks.at[:, 3].set(masks[:, 2])
        boxes = boxes.at[:, 3].set(boxes[:, 2])
        vecs = vecs.at[:, 3].set(vecs[:, 2])
        a = masks_to_layout_weights(vecs, boxes, masks, obj_mask, 64,
                                    test_mode=True, occlusion_impl="sort")
        b = masks_to_layout_weights(vecs, boxes, masks, obj_mask, 64,
                                    test_mode=True, occlusion_impl="matrix")
        assert a.dtype == b.dtype == dt
        assert bool(jnp.all(a == b)), f"trial {trial}: impls diverge"
