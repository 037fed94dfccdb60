"""Generator upsampling vs torch ConvTranspose2d (reference
generators.py:81-84: ConvTranspose2d(k=3, s=2, padding=1,
output_padding=1)).

The flax default (padding='SAME') is a one-pixel-shifted, unflipped
variant — fine for in-framework training (the network absorbs it;
documented divergence), but NO weight assignment can make it reproduce
torch. torch_deconv=True pins the exact torch semantics (explicit
((1,2),(1,2)) padding + transpose_kernel), enabling reference-weight
ports. Golden-tested against CPU torch.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import linen as nn

torch = pytest.importorskip("torch")


def _torch_ref(x_nhwc, w, b):
    import torch.nn.functional as F
    t = torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2))
    out = F.conv_transpose2d(t, torch.from_numpy(w), torch.from_numpy(b),
                             stride=2, padding=1, output_padding=1)
    return out.numpy().transpose(0, 2, 3, 1)


def _data(cin=4, cout=6, h=9, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(2, h, h, cin).astype(np.float32)
    w = rng.randn(cin, cout, 3, 3).astype(np.float32)  # torch (in, out, kh, kw)
    b = rng.randn(cout).astype(np.float32)
    return x, w, b


def test_torch_deconv_mode_bit_matches_torch():
    x, w, b = _data()
    ref = _torch_ref(x, w, b)
    mod = nn.ConvTranspose(w.shape[1], (3, 3), strides=(2, 2),
                           padding=((1, 2), (1, 2)), transpose_kernel=True)
    # transpose_kernel param layout: (kh, kw, OUT, IN).
    params = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
              "bias": jnp.asarray(b)}
    out = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_default_same_deconv_documented_divergence():
    """The default is NOT torch-equivalent: pin the divergence so it stays
    a documented one (if flax 'SAME' ever becomes torch-matching, the
    torch_deconv flag and this test should be retired together)."""
    x, w, b = _data()
    ref = _torch_ref(x, w, b)
    mod = nn.ConvTranspose(w.shape[1], (3, 3), strides=(2, 2),
                           padding="SAME")
    best = np.inf
    # Try the straight and spatially-flipped assignments in flax's
    # (kh, kw, in, out) layout; neither may match.
    for kernel in (w.transpose(2, 3, 0, 1),
                   w.transpose(2, 3, 0, 1)[::-1, ::-1]):
        params = {"kernel": jnp.asarray(np.ascontiguousarray(kernel)),
                  "bias": jnp.asarray(b)}
        out = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
        best = min(best, float(np.abs(out - ref).max()))
    assert best > 1e-2, "flax SAME deconv now matches torch: retire torch_deconv"


def test_generator_torch_deconv_runs_and_differs():
    """GlobalGenerator(torch_deconv=True) runs end-to-end and produces a
    different (shifted) field than the default — same shapes/params count."""
    from scene_generation_tpu.models.generators import GlobalGenerator

    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 12),
                    jnp.float32)
    outs = {}
    for flag in (False, True):
        gen = GlobalGenerator(output_nc=3, ngf=8, n_downsampling=2,
                              n_blocks=1, torch_deconv=flag)
        vs = gen.init(jax.random.PRNGKey(0), x)
        outs[flag] = np.asarray(gen.apply(vs, x))
        shapes = jax.tree.map(lambda p: p.shape, vs["params"])
    assert outs[False].shape == outs[True].shape == (1, 32, 32, 3)
    assert np.isfinite(outs[True]).all()
    assert np.abs(outs[False] - outs[True]).max() > 1e-4
