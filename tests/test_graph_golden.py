"""Golden parity: flax GraphTripleConv vs a literal torch re-enactment of
the reference layer (graph.py:58-122) with IDENTICAL weights.

The torch oracle implements the reference math directly — gather s/o,
concat [s, p, o], net1 MLP (ReLU after every layer incl. the last,
build_mlp layers.py:215-231), split into (s', p', o'), scatter_add pooling
averaged by appearance counts, net2 MLP — on the ragged (unpadded) tensors,
while the flax layer runs on the padded batch with validity masks.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scene_generation_tpu.models.graph import GraphTripleConv

torch = pytest.importorskip("torch")


def torch_oracle(params, obj_vecs, pred_vecs, edges, din, attr, h, dout):
    """Reference GraphTripleConv.forward math in torch (float64)."""

    def mlp(x, p):
        for i, layer in enumerate(sorted(p.keys())):
            w = torch.as_tensor(np.asarray(p[layer]["kernel"]),
                                dtype=torch.float64)
            b = torch.as_tensor(np.asarray(p[layer]["bias"]),
                                dtype=torch.float64)
            x = torch.relu(x @ w + b)
        return x

    obj_vecs = torch.as_tensor(obj_vecs, dtype=torch.float64)
    pred_vecs = torch.as_tensor(pred_vecs, dtype=torch.float64)
    s_idx = torch.as_tensor(edges[:, 0], dtype=torch.long)
    o_idx = torch.as_tensor(edges[:, 1], dtype=torch.long)
    o_count, t_count = obj_vecs.shape[0], pred_vecs.shape[0]

    cur_s = obj_vecs[s_idx]
    cur_o = obj_vecs[o_idx]
    cur_t = torch.cat([cur_s, pred_vecs, cur_o], dim=1)
    new_t = mlp(cur_t, params["net1"])
    new_s = new_t[:, :h]
    new_p = new_t[:, h:h + dout]
    new_o = new_t[:, h + dout:2 * h + dout]

    pooled = torch.zeros(o_count, h, dtype=torch.float64)
    pooled = pooled.scatter_add(
        0, s_idx.view(-1, 1).expand_as(new_s), new_s)
    pooled = pooled.scatter_add(
        0, o_idx.view(-1, 1).expand_as(new_o), new_o)
    counts = torch.zeros(o_count, dtype=torch.float64)
    ones = torch.ones(t_count, dtype=torch.float64)
    counts = counts.scatter_add(0, s_idx, ones)
    counts = counts.scatter_add(0, o_idx, ones)
    pooled = pooled / counts.clamp(min=1).view(-1, 1)
    new_obj = mlp(pooled, params["net2"])
    return new_obj.numpy(), new_p.numpy()


@pytest.mark.parametrize("seed", [0, 1])
def test_gconv_matches_torch_reference(seed):
    rng = np.random.RandomState(seed)
    din, attr, h, dout = 8, 3, 16, 8
    o_real, t_real = 5, 7
    o_pad, t_pad = 7, 10

    layer = GraphTripleConv(input_dim=din, attributes_dim=attr,
                            output_dim=dout, hidden_dim=h)

    obj = rng.randn(o_real, din + attr).astype(np.float32)
    pred = rng.randn(t_real, din).astype(np.float32)
    edges = rng.randint(0, o_real, (t_real, 2)).astype(np.int32)

    # Padded inputs with junk in the padding slots.
    obj_p = np.full((1, o_pad, din + attr), 9.0, np.float32)
    obj_p[0, :o_real] = obj
    pred_p = np.full((1, t_pad, din), -9.0, np.float32)
    pred_p[0, :t_real] = pred
    edges_p = np.zeros((1, t_pad, 2), np.int32)
    edges_p[0, :t_real] = edges
    tmask = np.zeros((1, t_pad), np.float32)
    tmask[0, :t_real] = 1

    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(obj_p),
                           jnp.asarray(pred_p), jnp.asarray(edges_p),
                           jnp.asarray(tmask))
    new_obj, new_pred = layer.apply(variables, jnp.asarray(obj_p),
                                    jnp.asarray(pred_p),
                                    jnp.asarray(edges_p), jnp.asarray(tmask))

    params = jax.tree.map(np.asarray, dict(variables["params"]))
    want_obj, want_pred = torch_oracle(params, obj, pred, edges,
                                       din, attr, h, dout)
    np.testing.assert_allclose(np.asarray(new_obj[0, :o_real]), want_obj,
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(new_pred[0, :t_real]), want_pred,
                               atol=1e-4, rtol=1e-4)
