"""Offline appearance-dictionary builder (reference
``scripts/encode_features.py``).

Crops every train object, encodes ``repr_net(image_encoder(crop))`` into a
per-class feature matrix saved as ``features.npy``
(encode_features.py:114-138), then k-means clusters each class with
k in {100, 10, 1} and orders centers by 1-D TSNE
(encode_features.py:82-100) -> ``features_clustered_XXX.npy``. These files
feed sampling (sample_images.py:169-174) and the GUI (gui/model.py:47-50).
"""
import argparse
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--output_dir", default="output")
    p.add_argument("--checkpoint_name", default="checkpoint")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_samples", type=int, default=None)
    p.add_argument("--save_dir", default=None,
                   help="defaults to <output_dir>")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--coco_dir", default="datasets/coco")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (same escape hatch as the "
                        "other model-forward scripts)")
    return p.parse_args()


def cluster(features_dict, n_clusters: int, save_path: str):
    """Per-class k-means + 1-D TSNE center ordering
    (encode_features.py:82-100)."""
    from sklearn.cluster import KMeans
    from sklearn.manifold import TSNE
    centers = {}
    for cls, feats in features_dict.items():
        feats = np.asarray(feats, np.float32)
        if len(feats) == 0:
            continue
        k = min(n_clusters, len(feats))
        km = KMeans(n_clusters=k, n_init=10, random_state=0).fit(feats)
        c = km.cluster_centers_
        if k > 2:
            order = np.argsort(
                TSNE(n_components=1, random_state=0,
                     perplexity=min(30.0, max(2.0, (k - 1) / 3.0)))
                .fit_transform(c)[:, 0])
            c = c[order]
        centers[cls] = c.astype(np.float32)
    np.save(save_path, centers, allow_pickle=True)
    return centers


def main():
    a = parse_args()
    import jax
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from scene_generation_tpu.api import InferenceModel
    from scene_generation_tpu.data.loader import DataLoader
    from scene_generation_tpu.ops.crop import crop_bbox_batch

    model = InferenceModel.from_checkpoint(a.output_dir, a.checkpoint_name)
    cfg = model.cfg
    if a.synthetic:
        from scene_generation_tpu.data.synthetic import SyntheticDataset
        dset = SyntheticDataset(cfg, size=a.num_samples or 64, seed=a.seed)
    elif model.vocab.get("is_panoptic"):
        # Panoptic checkpoints re-encode from the panoptic TRAIN split
        # (reference encode_features.py builds the matching family off
        # vocab['is_panoptic'], same as sample_images).
        from scripts.sample_images import build_coco_panoptic_dset
        dset = build_coco_panoptic_dset(model, a, split="train")
    else:
        from scene_generation_tpu.data.coco import CocoSceneGraphDataset
        d = cfg.data
        # Filtering follows the CHECKPOINT's data config (the reference
        # pulls min_object_size etc. from checkpoint_args,
        # encode_features.py:44-47) so the cluster dictionary is built
        # over the same object population the repr space was trained on.
        dset = CocoSceneGraphDataset(
            image_dir=os.path.join(a.coco_dir, "images/train2017"),
            instances_json=os.path.join(
                a.coco_dir, "annotations/instances_train2017.json"),
            stuff_json=os.path.join(
                a.coco_dir, "annotations/stuff_train2017.json"),
            image_size=d.image_size, mask_size=d.mask_size,
            min_object_size=d.min_object_size,
            min_objects_per_image=d.min_objects_per_image,
            max_objects_per_image=d.max_objects_per_image,
            max_samples=a.num_samples, seed=a.seed)
        dset.insert_pre_trained_vocab(model.vocab["object_to_idx"])
    loader = DataLoader(dset, batch_size=a.batch_size,
                        max_objs=cfg.data.max_objs,
                        max_triples=cfg.data.max_triples, shuffle=False)

    mc = cfg.model
    mods, state = model.mods, model.state

    from scene_generation_tpu.models.model import SceneModel

    # Weights enter as ARGUMENTS: closure-captured params would be baked
    # into the traced HLO as constants and constant-folded at (remote)
    # compile time (CLAUDE.md "NEVER closure-capture big arrays").
    @jax.jit
    def encode(variables, imgs, boxes, obj_mask):
        from scene_generation_tpu.ops.images import wire_to_float
        n, o = boxes.shape[:2]
        crops = crop_bbox_batch(wire_to_float(imgs), boxes, mc.object_size)
        flat = crops.reshape(n * o, mc.object_size, mc.object_size, 3)
        return mods.model.apply(variables, flat, False,
                                obj_mask.reshape(n * o),
                                method=SceneModel.encode_crops)

    g_vars = {"params": state.g_params, "batch_stats": state.g_stats}
    feats_by_class = defaultdict(list)
    for batch in loader:
        enc = np.asarray(encode(g_vars, jnp.asarray(batch.imgs),
                                jnp.asarray(batch.boxes),
                                jnp.asarray(batch.obj_mask)))
        n, o = batch.objs.shape
        enc = enc.reshape(n, o, -1)
        for i in range(n):
            for j in range(o):
                if batch.obj_mask[i, j] > 0:
                    feats_by_class[int(batch.objs[i, j])].append(enc[i, j])

    save_dir = a.save_dir or a.output_dir
    os.makedirs(save_dir, exist_ok=True)
    features = {c: np.stack(v) for c, v in feats_by_class.items()}
    np.save(os.path.join(save_dir, "features.npy"), features,
            allow_pickle=True)
    for k, name in ((100, "100"), (10, "010"), (1, "001")):
        cluster(features, k,
                os.path.join(save_dir, f"features_clustered_{name}.npy"))
    print(f"saved features for {len(features)} classes to {save_dir}")


if __name__ == "__main__":
    main()
