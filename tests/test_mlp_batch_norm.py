"""mlp_normalization='batch' (reference --mlp_normalization, args.py /
layers.py build_mlp batch_norm): init must not crash under the scanned
gconv stack, and the masked-BN statistics must exclude padded slots
(CLAUDE.md invariant: masked BN everywhere a padded object axis feeds
BN — the reference's packed tensors have no padded slots to leak).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from scene_generation_tpu.config import tiny_config
from scene_generation_tpu.models.graph import GraphTripleConvNet


def _toy_graph(key, n=3, o=5, t=6, d=32):
    ks = jax.random.split(key, 4)
    obj_vecs = jax.random.normal(ks[0], (n, o, d))
    pred_vecs = jax.random.normal(ks[1], (n, t, d))
    n_valid_objs = jnp.asarray([2, 5, 3])
    # Valid triples only ever reference valid object slots (the batching
    # contract); junk-invariance would not hold otherwise.
    edges = jax.random.randint(ks[2], (n, t, 2), 0, o) \
        % n_valid_objs[:, None, None]
    triple_mask = (jnp.arange(t)[None, :] < jnp.asarray([3, 6, 4])[:, None])
    obj_mask = (jnp.arange(o)[None, :] < n_valid_objs[:, None])
    return obj_vecs, pred_vecs, edges, triple_mask.astype(jnp.float32), \
        obj_mask.astype(jnp.float32)


def test_batch_norm_excludes_padded_slots():
    net = GraphTripleConvNet(input_dim=32, num_layers=3, hidden_dim=64,
                             mlp_normalization="batch")
    obj_vecs, pred_vecs, edges, tmask, omask = _toy_graph(
        jax.random.PRNGKey(0))
    variables = net.init(jax.random.PRNGKey(1), obj_vecs, pred_vecs, edges,
                         tmask, train=True, obj_mask=omask)

    def run(ov, pv, ed):
        out, _ = net.apply(variables, ov, pv, ed, tmask, train=True,
                           obj_mask=omask, mutable=["batch_stats"])
        return out

    (clean_obj, _), = [run(obj_vecs, pred_vecs, edges)]
    # Scribble junk into every PADDED slot (vectors and edges).
    junk_obj = jnp.where(omask[..., None] > 0, obj_vecs,
                         17.0 * jnp.ones_like(obj_vecs))
    junk_pred = jnp.where(tmask[..., None] > 0, pred_vecs,
                          -23.0 * jnp.ones_like(pred_vecs))
    junk_edges = jnp.where(tmask[..., None] > 0, edges,
                           jnp.zeros_like(edges))
    (junk_out, _), = [run(junk_obj, junk_pred, junk_edges)]

    valid = np.asarray(omask)[..., None] > 0
    np.testing.assert_allclose(np.asarray(clean_obj)[valid[..., 0]],
                               np.asarray(junk_out)[valid[..., 0]],
                               rtol=2e-5, atol=2e-5)


def test_scene_model_init_with_batch_norm():
    """Full SceneModel init with mlp_normalization='batch' (previously
    crashed: the gconv scan declared only the params collection)."""
    from scene_generation_tpu.data import synthetic_batch
    from scene_generation_tpu.models import SceneModel

    cfg = tiny_config()
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, mlp_normalization="batch"))
    mc = cfg.model
    batch = synthetic_batch(cfg, seed=0, batch_size=2)
    model = SceneModel(mc)
    noise = jnp.zeros((mc.mask_noise_dim,), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch.objs),
        jnp.asarray(batch.triples), jnp.asarray(batch.attributes),
        jnp.asarray(batch.obj_mask), jnp.asarray(batch.triple_mask), noise,
        imgs=jnp.asarray(batch.imgs), boxes_gt=jnp.asarray(batch.boxes),
        masks_gt=jnp.asarray(batch.masks), train=True)
    out, updates = model.apply(
        variables, jnp.asarray(batch.objs), jnp.asarray(batch.triples),
        jnp.asarray(batch.attributes), jnp.asarray(batch.obj_mask),
        jnp.asarray(batch.triple_mask), noise,
        imgs=jnp.asarray(batch.imgs), boxes_gt=jnp.asarray(batch.boxes),
        masks_gt=jnp.asarray(batch.masks), train=True,
        mutable=["batch_stats"])
    assert np.isfinite(np.asarray(out.imgs_pred)).all()
    assert "batch_stats" in updates
