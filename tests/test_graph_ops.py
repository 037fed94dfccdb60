"""GCN gather/pool parity with a dense scatter_add oracle (graph.py:94-116)."""
import numpy as np
import jax.numpy as jnp

from scene_generation_tpu.ops.graph_ops import triple_gather, segment_pool_objects


def oracle_pool(new_s, new_o, edges, mask, num_objs, pooling):
    t, hdim = new_s.shape
    pooled = np.zeros((num_objs, hdim), np.float32)
    counts = np.zeros((num_objs,), np.float32)
    for k in range(t):
        if not mask[k]:
            continue
        s, o = edges[k]
        pooled[s] += new_s[k]
        pooled[o] += new_o[k]
        counts[s] += 1
        counts[o] += 1
    if pooling == "avg":
        pooled = pooled / np.maximum(counts, 1)[:, None]
    return pooled


def test_gather():
    rng = np.random.RandomState(0)
    obj_vecs = rng.rand(2, 5, 3).astype(np.float32)
    edges = rng.randint(0, 5, (2, 4, 2)).astype(np.int32)
    s, o = triple_gather(jnp.asarray(obj_vecs), jnp.asarray(edges))
    for n in range(2):
        for t in range(4):
            np.testing.assert_array_equal(np.asarray(s[n, t]),
                                          obj_vecs[n, edges[n, t, 0]])
            np.testing.assert_array_equal(np.asarray(o[n, t]),
                                          obj_vecs[n, edges[n, t, 1]])


def test_pool_matches_oracle():
    rng = np.random.RandomState(1)
    n, t, o, hdim = 3, 6, 5, 8
    new_s = rng.randn(n, t, hdim).astype(np.float32)
    new_o = rng.randn(n, t, hdim).astype(np.float32)
    edges = rng.randint(0, o, (n, t, 2)).astype(np.int32)
    mask = (rng.rand(n, t) > 0.3).astype(np.float32)
    for pooling in ("avg", "sum"):
        got = segment_pool_objects(jnp.asarray(new_s), jnp.asarray(new_o),
                                   jnp.asarray(edges), jnp.asarray(mask),
                                   o, pooling)
        for i in range(n):
            want = oracle_pool(new_s[i], new_o[i], edges[i], mask[i], o, pooling)
            np.testing.assert_allclose(np.asarray(got[i]), want, atol=1e-5)


def test_masked_triples_contribute_nothing():
    n, t, o, hdim = 1, 3, 4, 2
    new_s = np.full((n, t, hdim), 7.0, np.float32)
    new_o = np.full((n, t, hdim), 7.0, np.float32)
    edges = np.zeros((n, t, 2), np.int32)
    mask = np.zeros((n, t), np.float32)
    got = segment_pool_objects(jnp.asarray(new_s), jnp.asarray(new_o),
                               jnp.asarray(edges), jnp.asarray(mask), o)
    np.testing.assert_allclose(np.asarray(got), 0.0)
