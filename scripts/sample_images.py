"""Batch inference / evaluation CLI (reference ``scripts/sample_images.py``).

Implements the Figure-3 ablation modes (README.md:84-94):
  (c) --use_gt_boxes 1 --use_gt_masks 1    GT layout
  (d) --use_gt_attr 1                      GT location/size attributes
  (e) --use_gt_textures 1                  GT appearance (crop-encoded)
  (f) none                                 scene graph only
plus --sample_attributes. Reports avg IoU and recall@0.5/0.3
(sample_images.py:241-295) and saves per-image predictions/layouts/graphs.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--output_dir", default="output")
    p.add_argument("--checkpoint_name", default="checkpoint")
    p.add_argument("--best", type=int, default=0)
    p.add_argument("--features_path", default=None,
                   help="features_clustered_100.npy from encode_features")
    p.add_argument("--use_gt_boxes", type=int, default=0)
    p.add_argument("--use_gt_masks", type=int, default=0)
    p.add_argument("--use_gt_attr", type=int, default=0)
    p.add_argument("--use_gt_textures", type=int, default=0)
    p.add_argument("--sample_attributes", type=int, default=0)
    p.add_argument("--test_part", type=int, default=1,
                   help="1 (reference parity, coco.py:188-189): skip the "
                        "first 1024 val images; 0: use the whole val set "
                        "(required for small fixture datasets)")
    p.add_argument("--accuracy_model_path", default=None,
                   help="orbax checkpoint from train_accuracy_net.py")
    p.add_argument("--accuracy_tiny", type=int, default=0,
                   help="accuracy net was trained with --tiny")
    p.add_argument("--accuracy_crop_size", type=int, default=224)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_samples", type=int, default=64)
    p.add_argument("--save_dir", default="samples")
    p.add_argument("--save_imgs", type=int, default=1)
    p.add_argument("--save_layouts", type=int, default=1)
    p.add_argument("--save_graphs", type=int, default=0)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--coco_dir", default="datasets/coco")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (same escape hatch as "
                        "compute_fid/compute_diversity — the remote-TPU "
                        "compiler is occasionally unavailable)")
    return p.parse_args()


def _eval_mask_size(d, a) -> int:
    """--use_gt_masks evaluates with FULL-RESOLUTION GT masks: the
    reference raises mask_size to image_size[0] for that ablation
    (sample_images.py:67); every other mode keeps the checkpoint's
    mask_size."""
    if getattr(a, "use_gt_masks", 0):
        return d.image_size[0]
    return d.mask_size


def build_coco_panoptic_dset(model, a, split="val"):
    """Panoptic val/train dataset matching a panoptic checkpoint's vocab
    (reference sample_images.py:88-112 build_coco_panoptic_dset; selected
    by vocab['is_panoptic'], :179)."""
    from scene_generation_tpu.data.coco_panoptic import (
        CocoPanopticSceneGraphDataset)
    d = model.cfg.data
    dset = CocoPanopticSceneGraphDataset(
        image_dir=os.path.join(a.coco_dir, f"images/{split}2017"),
        panoptic=os.path.join(
            a.coco_dir, f"annotations/panoptic_{split}2017.json"),
        panoptic_segmentation=os.path.join(
            a.coco_dir, f"panoptic/annotations/panoptic_{split}2017"),
        panoptic_categories=os.path.join(
            a.coco_dir, "annotations/panoptic_coco_categories.json"),
        image_size=d.image_size, mask_size=_eval_mask_size(d, a),
        min_object_size=d.min_object_size,
        min_objects_per_image=d.min_objects_per_image,
        max_objects_per_image=d.max_objects_per_image,
        sample_attributes=bool(getattr(a, "sample_attributes", 0)),
        test_part=bool(getattr(a, "test_part", 1)) and split == "val",
        max_samples=getattr(a, "num_samples", None),  # reference :74
        seed=a.seed)
    dset.insert_pre_trained_vocab(model.vocab["object_to_idx"])
    return dset


def build_loader(model, a):
    from scene_generation_tpu.data.loader import DataLoader
    cfg = model.cfg
    if a.synthetic:
        from scene_generation_tpu.data.synthetic import SyntheticDataset
        dset = SyntheticDataset(cfg, size=max(a.num_samples, a.batch_size),
                                seed=a.seed + 7)
    elif model.vocab.get("is_panoptic"):
        dset = build_coco_panoptic_dset(model, a, split="val")
    else:
        from scene_generation_tpu.data.coco import CocoSceneGraphDataset
        d = cfg.data
        dset = CocoSceneGraphDataset(
            image_dir=os.path.join(a.coco_dir, "images/val2017"),
            instances_json=os.path.join(
                a.coco_dir, "annotations/instances_val2017.json"),
            stuff_json=os.path.join(
                a.coco_dir, "annotations/stuff_val2017.json"),
            image_size=d.image_size, mask_size=_eval_mask_size(d, a),
            min_object_size=d.min_object_size,
            min_objects_per_image=d.min_objects_per_image,
            max_objects_per_image=d.max_objects_per_image,
            sample_attributes=bool(a.sample_attributes),
            test_part=bool(getattr(a, "test_part", 1)),
            max_samples=a.num_samples,  # reference sample_images.py:74
            seed=a.seed)
        dset.insert_pre_trained_vocab(model.vocab["object_to_idx"])
    return DataLoader(dset, batch_size=a.batch_size,
                      max_objs=cfg.data.max_objs,
                      max_triples=cfg.data.max_triples, shuffle=False,
                      num_workers=4)


def main():
    a = parse_args()
    if a.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from scene_generation_tpu.api import InferenceModel
    from scene_generation_tpu.data.image_utils import deprocess
    from scene_generation_tpu.metrics import jaccard
    from scene_generation_tpu.vis import draw_layout, draw_scene_graph
    import jax
    import jax.numpy as jnp
    import PIL.Image

    model = InferenceModel.from_checkpoint(
        a.output_dir, a.checkpoint_name, best=bool(a.best),
        features_path=a.features_path)
    loader = build_loader(model, a)
    os.makedirs(a.save_dir, exist_ok=True)
    rng = np.random.RandomState(a.seed)

    # Optional object-classification accuracy of generated crops
    # (reference sample_images.py:224-239).
    accuracy_fn = None
    if a.accuracy_model_path:
        import jax
        import orbax.checkpoint as ocp
        from scene_generation_tpu.models.resnet import ResNet, resnet101
        from scene_generation_tpu.ops.crop import crop_bbox_batch
        num_classes = model.cfg.model.num_objs
        acc_crop = 32 if a.accuracy_tiny else a.accuracy_crop_size
        net = (ResNet(stage_sizes=(1, 1, 1, 1), num_classes=num_classes)
               if a.accuracy_tiny else resnet101(num_classes))
        acc_vars = ocp.PyTreeCheckpointer().restore(
            os.path.abspath(a.accuracy_model_path))

        @jax.jit
        def accuracy_fn(variables, imgs, boxes, objs, obj_mask):
            n, o = objs.shape
            crops = crop_bbox_batch(imgs, boxes, acc_crop).reshape(
                n * o, acc_crop, acc_crop, 3)
            logits = net.apply(variables, crops, train=False)
            labels = objs.reshape(n * o)
            w = obj_mask.reshape(n * o) * (labels != 0)
            correct = (jnp.argmax(logits, -1) == labels) * w
            return jnp.sum(correct), jnp.sum(w)

    total_iou = total_boxes = total_r05 = total_r03 = 0.0
    total_correct = total_classified = 0.0
    saved = 0
    for batch in loader:
        if a.use_gt_textures:
            features = features_mask = None
        else:
            features, features_mask = model.sample_cluster_features(
                batch.objs, batch.obj_mask, rng)
        # Attributes are zeroed unless --use_gt_attr, regardless of
        # sampling mode (reference sample_images.py:216-217).
        out = model.forward_batch(
            batch, use_gt_boxes=bool(a.use_gt_boxes),
            use_gt_masks=bool(a.use_gt_masks),
            use_gt_attributes=bool(a.use_gt_attr),
            features=features, features_mask=features_mask)
        mask = batch.obj_mask * (batch.objs != 0)
        if accuracy_fn is not None:
            # Crops come from GT boxes only under --use_gt_boxes
            # (reference sample_images.py:225-228).
            acc_boxes = (jnp.asarray(batch.boxes) if a.use_gt_boxes
                         else out.boxes_pred)
            correct, classified = accuracy_fn(
                acc_vars, out.imgs_pred, acc_boxes,
                jnp.asarray(batch.objs), jnp.asarray(batch.obj_mask))
            correct, classified = jax.device_get((correct, classified))
            total_correct += float(correct)
            total_classified += float(classified)
        iou, r05, r03 = jaccard(out.boxes_pred, jnp.asarray(batch.boxes),
                                jnp.asarray(mask))
        # One transfer for the scalar stats (RESULTS.md §24 readback
        # discipline).
        iou, r05, r03 = jax.device_get((iou, r05, r03))
        total_iou += float(iou)
        total_r05 += float(r05)
        total_r03 += float(r03)
        total_boxes += float(mask.sum())

        for i in range(batch.num_images):
            if saved >= a.num_samples:
                break
            stem = os.path.join(a.save_dir, f"img{saved:06d}")
            if a.save_imgs:
                PIL.Image.fromarray(
                    deprocess(np.asarray(out.imgs_pred[i]))).save(
                        stem + "_pred.png")
                PIL.Image.fromarray(
                    deprocess(np.asarray(batch.imgs[i]))).save(
                        stem + "_gt.png")
            if a.save_layouts:
                o_real = int(batch.obj_mask[i].sum())
                PIL.Image.fromarray(draw_layout(
                    model.vocab, batch.objs[i][:o_real],
                    np.asarray(out.boxes_pred[i])[:o_real],
                    np.asarray(out.masks_pred[i])[:o_real])).save(
                        stem + "_layout.png")
            if a.save_graphs:
                t_real = int(batch.triple_mask[i].sum())
                res = draw_scene_graph(model.vocab, batch.objs[i],
                                       batch.triples[i][:t_real],
                                       output_path=stem + "_graph.png")
                if isinstance(res, str) and not res.endswith(".png"):
                    with open(stem + "_graph.dot", "w") as f:
                        f.write(res)
            saved += 1
        if saved >= a.num_samples:
            break

    nb = max(total_boxes, 1.0)
    results = {"avg_iou": total_iou / nb, "recall@0.5": total_r05 / nb,
               "recall@0.3": total_r03 / nb, "num_images": saved}
    if accuracy_fn is not None:
        results["object_accuracy"] = (
            total_correct / max(total_classified, 1.0))
    print(json.dumps(results))
    with open(os.path.join(a.save_dir, "results.json"), "w") as f:
        json.dump(results, f)


if __name__ == "__main__":
    main()
