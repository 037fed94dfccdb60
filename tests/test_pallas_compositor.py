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


# ---------------------------------------------------------------------------
# Precision pin (ADVICE r3): TPU matmuls with f32 inputs default to ONE
# bf16xbf16 MXU pass whose ~8-bit input mantissa rounds resampled
# sigmoid-init masks (0.500x) to exactly 0.5 — the test-mode `> 0.5`
# occlusion claim then fires nowhere and f32 serving composites an all-zero
# image (observed on v5e at image_size=64). The CPU suite computes exact
# f32, so the only durable guard is structural: every dot in BOTH
# compositor backends must carry Precision.HIGHEST.
# ---------------------------------------------------------------------------
import jax


def _subjaxprs(v):
    if hasattr(v, "jaxpr"):          # ClosedJaxpr
        yield v.jaxpr
    elif hasattr(v, "eqns"):         # Jaxpr (e.g. pallas_call kernel body)
        yield v
    elif isinstance(v, (list, tuple)):
        for x in v:
            yield from _subjaxprs(x)


def _dot_precisions(jaxpr):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "dot_general":
            yield eqn.params.get("precision")
        for v in eqn.params.values():
            for sub in _subjaxprs(v):
                yield from _dot_precisions(sub)


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_all_compositor_dots_pin_highest_precision(backend):
    vecs, boxes, masks, obj_mask, h, w = _case()
    kwargs = dict(test_mode=True, backend=backend)
    if backend == "pallas":
        kwargs["interpret"] = True
    jx = jax.make_jaxpr(
        lambda *a: masks_to_layout(*a, h, w, **kwargs))(
            vecs, boxes, masks, obj_mask)
    precisions = list(_dot_precisions(jx.jaxpr))
    assert precisions, "no dot_general found — tracing changed?"
    hi = jax.lax.Precision.HIGHEST
    bad = [p for p in precisions
           # The final vecs contraction (weights x vecs) is threshold-free
           # output math; only None (default = one bf16 pass) is forbidden
           # there too, because layout values feed the generator stem.
           if p != (hi, hi)]
    assert not bad, f"dots without HIGHEST precision: {bad}"


def test_half_threshold_masks_survive_bf16_pass_emulation():
    """Mini-repro of the v5e symptom: masks at 0.5 + 2^-12 (which bf16
    rounds to exactly 0.5) must still claim pixels. Emulating the single
    bf16 MXU pass by pre-rounding the masks zeroes the composite — the
    exact path must not."""
    n, o, d, m, h, w = 1, 2, 4, 8, 32, 32
    vecs = jnp.ones((n, o, d), jnp.float32)
    boxes = jnp.tile(jnp.asarray([0.1, 0.1, 0.9, 0.9], jnp.float32),
                     (n, o, 1))
    val = np.float32(0.5 + 2.0 ** -12)
    assert jnp.bfloat16(val) == jnp.bfloat16(0.5)  # premise of the repro
    masks = jnp.full((n, o, m, m), val, jnp.float32)
    obj_mask = jnp.ones((n, o), jnp.float32)

    exact = masks_to_layout(vecs, boxes, masks, obj_mask, h, w,
                            test_mode=True)
    assert float(jnp.abs(exact).sum()) > 0.0

    rounded = masks.astype(jnp.bfloat16).astype(jnp.float32)
    zeroed = masks_to_layout(vecs, boxes, rounded, obj_mask, h, w,
                             test_mode=True)
    assert float(jnp.abs(zeroed).sum()) == 0.0
